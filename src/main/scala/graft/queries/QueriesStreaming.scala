package graft.queries

import graft.streaming.StreamingEvents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming queries, oracle-checked: the streaming hourly
  * rollup runs the SAME logical aggregation as the batch events_hourly
  * query via readStream → AvailableNow → memory sink, and must produce the
  * identical table — the kappa-architecture batch/stream equivalence gate.
  */
object QueriesStreaming {

  private val runId = new AtomicInteger(0)

  private def streamingHourly(s: SparkSession, dir: String): DataFrame = {
    val stream = StreamingEvents.readEvents(s, s"$dir/events.parquet")
    val name = s"graft_streaming_hourly_${runId.incrementAndGet()}"
    // size-derived state partition count capped at the session conf
    // (VERDICT r13 next-round #5): the state-store partition count of a
    // fresh streaming query is the shuffle-partition conf, and every
    // micro-batch pays one HDFS-state-store commit per partition — at
    // bench scale that was conf-many (32) near-empty store commits for a
    // bounded hours×event_types group count. ceil(rows/100k) keeps the
    // rule scale-adaptive (the conf cap engages at corpus scale); the
    // parquet row count is footer metadata, not a scan.
    val rows = s.read.parquet(s"$dir/events.parquet").count()
    val conf = s.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(1L, math.min(conf.toLong, (rows + 99999) / 100000)).toInt
    StreamingEvents.runToMemory(StreamingEvents.hourlyRollup(stream), name,
        statePartitions = Some(parts))
      .orderBy("hour_ms", "event_type")
  }

  private val streamingHourlyOracle =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "streaming_hourly" -> (streamingHourly _),
  )

  val oracles: Map[String, String] = Map(
    "streaming_hourly" -> streamingHourlyOracle,
  )
}
