package graft

import graft.core.{BuildParams, Metric, SearchParams, Tables}
import graft.ops.KnnJoin
import graft.streaming.StreamingAnn
import org.apache.spark.sql.functions._

/** Streaming ANN ingestion gates: vectors are searchable as soon as their
  * micro-batch commits (tail path, exact quality), the periodic rebuild
  * covers everything up to its watermark, and the merged search tracks
  * exact kNN over the full ingested corpus. */
class StreamingAnnSpec extends SparkSpec {

  test("index + tail search matches exact kNN over everything ingested") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ann").toString
    val emb = Tables.vectors(spark, sf0001)
    def rows(lo: Long, hi: Long): Seq[(Long, Array[Float])] =
      emb.filter(col("id") >= lo && col("id") < hi)
        .select(col("id").cast("long"), col("vec"))
        .as[(Long, Array[Float])].collect().toSeq

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val params = BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2)
    val q = StreamingAnn.ingest(ms.toDF.toDF("id", "vec"), dir, params,
      rebuildEvery = 2)

    ms.addData(rows(100, 250)); q.processAllAvailable() // batch 0
    ms.addData(rows(250, 400)); q.processAllAvailable() // batch 1 → rebuild
    StreamingAnn.awaitRebuilds(dir) // rebuilds are async — wait for publish
    ms.addData(rows(400, 450)); q.processAllAvailable() // batch 2 = tail
    q.stop()

    // the rebuild covered batches 0-1; batch 2 is the un-indexed tail
    // (published as an immutable versioned snapshot + pointer file)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_latest"))).trim == "v1")
    assert(spark.read.parquet(s"$dir/index_versions/v1/watermark")
      .head().getLong(0) == 1L)

    val queries = emb.filter(col("id") < 50).select("id", "vec")
    val res = StreamingAnn.search(spark, dir, queries,
      SearchParams(10, 100, Metric.L2, numSeeds = 4))
      .select(col("query_id"), col("ids"))
    val all = emb.filter(col("id") >= 100 && col("id") < 450).select("id", "vec")
    val gt = KnnJoin(queries, all, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    val recall = graft.eval.Eval.recallAtK(res, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall >= 0.9, s"streaming-ingest search recall@10 = $recall")

    // tail immediacy: a query identical to a tail vector finds it first,
    // at exact-kNN quality, without any rebuild having seen it
    val tailProbe = emb.filter(col("id") === 420).select("id", "vec")
    val probeTop = StreamingAnn.search(spark, dir, tailProbe,
      SearchParams(10, 100, Metric.L2))
      .select(col("ids")(0)).head().getLong(0)
    assert(probeTop == 420L, s"tail vector not found first: $probeTop")
  }

  test("ingest keeps committing while a slow rebuild is in flight; triggers coalesce") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-async").toString
    val emb = Tables.vectors(spark, sf0001)
    def rows(lo: Long, hi: Long): Seq[(Long, Array[Float])] =
      emb.filter(col("id") >= lo && col("id") < hi)
        .select(col("id").cast("long"), col("vec"))
        .as[(Long, Array[Float])].collect().toSeq

    // park the first rebuild on a latch — the stand-in for the ~30 min
    // wall a rebuild costs at soak scale
    val entered = new java.util.concurrent.CountDownLatch(1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    StreamingAnn.testRebuildBarrier = () => {
      StreamingAnn.testRebuildBarrier = () => () // only the first rebuild parks
      entered.countDown()
      gate.await()
    }
    try {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Array[Float])]
      val params = BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2)
      val q = StreamingAnn.ingest(ms.toDF.toDF("id", "vec"), dir, params,
        rebuildEvery = 2)
      ms.addData(rows(100, 200)); q.processAllAvailable() // batch 0
      ms.addData(rows(200, 300)); q.processAllAvailable() // batch 1 → rebuild parks
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "rebuild never started")

      // the rebuild thread is parked; micro-batches MUST keep committing
      // (a synchronous-in-foreachBatch rebuild would deadlock right here)
      ms.addData(rows(300, 350)); q.processAllAvailable() // batch 2
      ms.addData(rows(350, 400)); q.processAllAvailable() // batch 3 → trigger queues
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/_latest")), "nothing published yet")

      // ingest-to-searchable freshness is independent of the rebuild wall:
      // a batch-2 vector is findable NOW, through the exact tail path
      val probe = emb.filter(col("id") === 320).select("id", "vec")
      val top = StreamingAnn.search(spark, dir, probe,
        SearchParams(5, 60, Metric.L2)).select(col("ids")(0)).head().getLong(0)
      assert(top == 320L, s"tail vector not findable during rebuild: $top")

      gate.countDown() // release the parked rebuild
      StreamingAnn.awaitRebuilds(dir)
      q.stop()

      // the parked rebuild published v1; the trigger that arrived while it
      // ran coalesced to the LATEST watermark (batch 3) — monotone, no
      // intermediate v2 (skipped rebuilds lose nothing: v3 covers them)
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/_latest"))).trim == "v3")
      assert(spark.read.parquet(s"$dir/index_versions/v3/watermark")
        .head().getLong(0) == 3L)

      // and the final published index + empty tail matches exact kNN
      val queries = emb.filter(col("id") < 30).select("id", "vec")
      val res = StreamingAnn.search(spark, dir, queries,
        SearchParams(10, 100, Metric.L2, numSeeds = 4))
        .select(col("query_id"), col("ids"))
      val all = emb.filter(col("id") >= 100 && col("id") < 400).select("id", "vec")
      val gt = KnnJoin(queries, all, 10, Metric.L2)
        .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
      val recall = graft.eval.Eval.recallAtK(res, gt, 10)
        .collect().head.getAs[Double]("recall_at_k")
      assert(recall >= 0.9, s"post-catch-up recall@10 = $recall")
    } finally {
      StreamingAnn.testRebuildBarrier = () => ()
      gate.countDown()
    }
  }

  test("searches concurrent with rebuilds never observe a torn index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-atomic").toString
    val emb = Tables.vectors(spark, sf0001)
    // lay down three ingested batches directly (the ingest layout)
    for (b <- 0 to 2)
      emb.filter(col("id") >= 100 + 100 * b && col("id") < 200 + 100 * b)
        .select(col("id").cast("long"), col("vec"))
        .withColumn("batch_id", lit(b.toLong))
        .write.mode("append").parquet(s"$dir/vectors")
    val params = BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2)
    StreamingAnn.rebuild(spark, dir, params, upToBatch = 0)

    val queries = emb.filter(col("id") < 10).select("id", "vec").cache()
    val nQ = queries.count()
    @volatile var rebuildErr: Option[Throwable] = None
    val rebuilder = new Thread(() => {
      try for (b <- 1 to 2) StreamingAnn.rebuild(spark, dir, params, b)
      catch { case t: Throwable => rebuildErr = Some(t) }
    })
    rebuilder.start()
    // hammer searches while snapshots are being published underneath; a
    // torn read (pointer naming a half-written snapshot, or a snapshot
    // deleted mid-read) would throw or drop queries
    var n = 0
    while ((rebuilder.isAlive && n < 50) || n == 0) {
      val res = StreamingAnn.search(spark, dir, queries,
        core.SearchParams(5, 60, Metric.L2, numSeeds = 4))
      assert(res.count() == nQ, s"search $n dropped queries")
      n += 1
    }
    rebuilder.join()
    assert(rebuildErr.isEmpty, s"concurrent rebuild failed: $rebuildErr")
    assert(n >= 1)
    queries.unpersist()

    // final state: pointer names v2, snapshots pruned to the last two
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_latest"))).trim == "v2")
    val versions = new java.io.File(s"$dir/index_versions").list().toSet
    assert(versions == Set("v1", "v2"), s"unexpected snapshots: $versions")
  }
}
