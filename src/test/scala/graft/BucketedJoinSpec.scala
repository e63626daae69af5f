package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Evidence for SCALE.md's co-location claim: joining two tables bucketed
  * on the join key must plan WITHOUT a shuffle exchange on either side —
  * the layout that makes repeated big-table joins O(0 shuffles) at 100 TB. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join runs with no shuffle exchange") {
    // default warehouse dir (./spark-warehouse); DROP ... CASCADE cleans up
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables(spark, sf0001, "orders")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(s"$db.orders_b")
      Tables(spark, sf0001, "lineitem")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      // and the result matches the unbucketed join
      val plain = Tables(spark, sf0001, "lineitem")
        .join(Tables(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("qty"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
