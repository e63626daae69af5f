package graft

import graft.core.{Metric, Tables}
import graft.ops.KnnJoin
import graft.plans.PlannedKnnJoin
import org.apache.spark.sql.functions._

/** The whole-operator Catalyst path (KnnJoinNode → KnnJoinStrategy →
  * KnnJoinExec) must produce identical results to the Dataset-API operator
  * and actually appear in the physical plan. */
class PlannedKnnJoinSpec extends SparkSpec {

  private def q = Tables.vectors(spark, sf0001).filter(col("id") < 10)
  private def b = Tables.vectors(spark, sf0001).filter(col("id") >= 10)

  test("planned kNN join == Dataset-API kNN join (L2)") {
    val planned = KnnJoin.explodeRanks(PlannedKnnJoin(q, b, 5, Metric.L2))
      .select("query_id", "rank", "base_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(identity)
    val api = KnnJoin.explodeRanks(KnnJoin(q, b, 5, Metric.L2))
      .select("query_id", "rank", "base_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(identity)
    assert(planned.nonEmpty && planned.sameElements(api))
  }

  test("logical plan carries KnnJoinNode; lowering keeps pushdown + native expr") {
    val df = PlannedKnnJoin(q, b, 5, Metric.L2)
    assert(df.queryExecution.logical.toString.contains("KnnJoin"),
      "logical plan missing the custom node")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_l2sq"), s"native distance expr missing:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)]"),
      s"pushdown lost below the custom node:\n$plan")
  }
}
