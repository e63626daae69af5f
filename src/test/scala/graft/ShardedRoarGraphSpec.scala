package graft

import graft.build.ShardedRoarGraph
import graft.core.{BuildParams, Metric, SearchParams, Tables}
import graft.ops.KnnJoin
import org.apache.spark.sql.functions._

class ShardedRoarGraphSpec extends SparkSpec {

  test("3-shard build+search clears the recall gate (peak index = 1/3 size)") {
    val emb = Tables.vectors(spark, sf0001)
    val queriesDf = emb.filter(col("id") < 100)
    val baseDf = emb.filter(col("id") >= 100)
    val sharded = ShardedRoarGraph.build(baseDf, queriesDf,
      BuildParams(mSq = 40, mPjbp = 12, lPjpq = 60, metric = Metric.L2),
      numShards = 3)
    assert(sharded.shards.size == 3)
    // disjoint, complete cover of the base ids
    val all = sharded.shards.flatMap(_.ids)
    assert(all.length == all.distinct.length)
    assert(all.length == baseDf.count())

    val res = ShardedRoarGraph.searchBatch(sharded, queriesDf,
      SearchParams(k = 10, lPq = 100, metric = Metric.L2))
      .select(col("query_id"), col("ids"))
    val gt = KnnJoin(queriesDf, baseDf, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    val recall = graft.eval.Eval.recallAtK(res, gt, 10)
      .collect().head.getAs[Double]("recall_at_k")
    assert(recall >= 0.95, s"sharded recall@10 = $recall")
  }
}
