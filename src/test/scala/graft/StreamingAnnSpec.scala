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
    ms.addData(rows(400, 450)); q.processAllAvailable() // batch 2 = tail
    q.stop()

    // the rebuild covered batches 0-1; batch 2 is the un-indexed tail
    assert(spark.read.parquet(s"$dir/index_watermark").head().getLong(0) == 1L)

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
}
