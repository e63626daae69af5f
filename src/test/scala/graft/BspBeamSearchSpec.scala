package graft

import graft.build.RoarGraphBuilder
import graft.core.{BuildParams, Metric, SearchParams, Tables}
import graft.ops.KnnJoin
import graft.ops.graph.{BspBeamSearch, GraphIO}
import org.apache.spark.sql.functions._

/** The BSP (no-broadcast) search must reach the same recall regime as the
  * broadcast kernel over the same RoarGraph index. */
class BspBeamSearchSpec extends SparkSpec {

  test("BSP frontier search recall@10 >= 0.9 on the sf0.001 RoarGraph") {
    implicit val s = spark
    val emb = Tables.vectors(spark, sf0001)
    val queriesDf = emb.filter(col("id") < 100)
    val baseDf = emb.filter(col("id") >= 100)
    val index = RoarGraphBuilder.build(baseDf, queriesDf,
      BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2))

    val adjDf = GraphIO.toDF(index)
    val res = BspBeamSearch.search(adjDf, baseDf, queriesDf,
      k = 10, l = 60, ep = index.ids(index.ep), Metric.L2)
      .select(col("query_id"), col("ids"))
    val gt = KnnJoin(queriesDf, baseDf, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    val recall = graft.eval.Eval.recallAtK(res, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall >= 0.9, s"BSP recall@10 = $recall")

    // and it should be close to the broadcast kernel at the same beam width
    val bcRes = RoarGraphBuilder.searchBatch(index, queriesDf,
      SearchParams(10, 60, Metric.L2)).select(col("query_id"), col("ids"))
    val bcRecall = graft.eval.Eval.recallAtK(bcRes, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(math.abs(recall - bcRecall) <= 0.1,
      s"BSP $recall vs broadcast $bcRecall")
  }
}
