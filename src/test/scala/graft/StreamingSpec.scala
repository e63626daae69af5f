package graft

import graft.ops.EventOps
import graft.core.Tables
import graft.streaming.StreamingEvents
import org.apache.spark.sql.functions._

/** Batch/stream equivalence gates: the streaming operators must reproduce
  * their batch counterparts over the same files (kappa architecture). */
class StreamingSpec extends SparkSpec {

  test("streaming hourly rollup equals batch rollup") {
    val stream = StreamingEvents.readEvents(spark, s"$sf0001/events.parquet")
    val res = StreamingEvents.runToMemory(
      StreamingEvents.hourlyRollup(stream), "test_stream_hourly")
    val batch = EventOps.hourlyRollup(Tables.events(spark, sf0001))
    assert(res.exceptAll(batch).isEmpty && batch.exceptAll(res).isEmpty)
  }

  test("hourly rollup is batch-equal across multiple micro-batches") {
    // split the events table into several files and feed them one per
    // micro-batch — state must merge identically to the single-batch case
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.events(spark, sf0001).repartition(3).write.mode("overwrite")
      .parquet(s"$dir/events")
    val schema = spark.read.parquet(s"$dir/events").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/events")
    val res = StreamingEvents.runToMemory(
      StreamingEvents.hourlyRollup(stream), "test_stream_hourly_mb")
    val batch = EventOps.hourlyRollup(Tables.events(spark, sf0001))
    assert(res.exceptAll(batch).isEmpty && batch.exceptAll(res).isEmpty)
  }

  test("streaming sessionize emits exactly the watermark-closed batch sessions") {
    val stream = StreamingEvents.readEvents(spark, s"$sf0001/events.parquet")
    val sessions = StreamingEvents.sessionize(stream)
    val q = sessions.writeStream.format("memory").queryName("test_stream_sess")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val res = spark.table("test_stream_sess")

    val events = Tables.events(spark, sf0001)
    val maxMs = events.select(max(EventOps.tsMs(events))).collect().head.getLong(0)
    // sessions still open at end-of-stream (within gap of the final
    // watermark) never time out — exclude them from the batch side too
    val batch = EventOps.sessionize(events)
      .filter(col("session_end_ms") + EventOps.SessionGapMs <= maxMs)
    val resCmp = res.select("user_id", "session_start_ms", "session_end_ms", "n_events")
    val batchCmp = batch.select("user_id", "session_start_ms", "session_end_ms", "n_events")
    assert(resCmp.exceptAll(batchCmp).isEmpty && batchCmp.exceptAll(resCmp).isEmpty,
      s"stream=${resCmp.count()} batch=${batchCmp.count()}")
  }
}
