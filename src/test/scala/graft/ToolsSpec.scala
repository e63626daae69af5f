package graft

import graft.build.RoarGraphBuilder
import graft.core.{BuildParams, Metric, SearchParams, Tables}
import graft.ops.graph.GraphIO
import graft.sources.FbinCodec
import graft.tools.Tools
import org.apache.spark.sql.functions._

/** The CLI workflow (fbin in → saved index → sweep) end-to-end, minus the
  * main() session lifecycle (tests share one session). */
class ToolsSpec extends SparkSpec {

  test("fbin-in build + save + load + search round-trip (reference workflow)") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-tools").toString
    val emb = Tables.vectors(spark, sf0001)
    // export the reference-style inputs
    FbinCodec.writeFbin(emb.filter(col("id") >= 100).select("id", "vec"),
      s"$dir/base.fbin")
    FbinCodec.writeFbin(emb.filter(col("id") < 100).select("id", "vec"),
      s"$dir/train.fbin")

    // BuildTool core path (fbin ids are positional 0..n-1 — self-consistent)
    val base = Tools.readVectors(spark, s"$dir/base.fbin")
    val train = Tools.readVectors(spark, s"$dir/train.fbin")
    val index = RoarGraphBuilder.build(base, train,
      BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2))
    GraphIO.save(index, s"$dir/index")

    // SearchTool core path
    val loaded = GraphIO.load(s"$dir/index")
    val res = RoarGraphBuilder.searchBatch(loaded, train,
      SearchParams(10, 100, Metric.L2))
      .select(col("query_id"), col("ids"))
    val gt = graft.ops.KnnJoin(train, base, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    val recall = graft.eval.Eval.recallAtK(res, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall >= 0.95, s"tool-path recall@10 = $recall")
  }

  test("distributed-tier CLI workflow: build + saveDist + loadDist + search") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-tools-dist").toString
    val emb = Tables.vectors(spark, sf0001)
    val base = emb.filter(col("id") >= 100).select("id", "vec")
    val train = emb.filter(col("id") < 100).select("id", "vec")
    val di = graft.build.DistRoarGraphBuilder.build(base, train,
      BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2))
    GraphIO.saveDist(di, s"$dir/index")
    // SearchTool's dist branch: adjacency-only layout detected, vectors
    // supplied separately, loaded through the broadcast kernel
    assert(!spark.read.parquet(s"$dir/index/adjacency").columns.contains("vec"))
    val loaded = graft.ops.graph.GraphSearch.indexFromDist(
      GraphIO.loadDist(s"$dir/index"), base)
    val res = RoarGraphBuilder.searchBatch(loaded, train,
      SearchParams(10, 100, Metric.L2, numSeeds = 4))
      .select(col("query_id"), col("ids"))
    val gt = graft.ops.KnnJoin(train, base, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    val recall = graft.eval.Eval.recallAtK(res, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall >= 0.95, s"dist tool-path recall@10 = $recall")
  }

  test("arg parsing") {
    val a = Tools.parseArgs(Array("--base", "b.fbin", "--M_sq", "100"))
    assert(a == Map("base" -> "b.fbin", "M_sq" -> "100"))
  }

  test("arg parsing: bare boolean flags do not shift later keys") {
    // regression: pair-sliding consumed `--db` as --searchOnly's value,
    // so a soak sweep silently ran with the default db and default l
    val a = Tools.parseArgs(
      Array("--searchOnly", "--db", "x", "--l", "300", "--flagAtEnd"))
    assert(a == Map("searchOnly" -> "true", "db" -> "x", "l" -> "300",
      "flagAtEnd" -> "true"))
  }
}
