package graft

import graft.core.{Metric, Tables}
import graft.ops.KnnJoin
import graft.ops.graph.VecStore
import org.apache.spark.sql.functions._

/** Metamorphic + negative-input gates for the vector operators. */
class MetamorphicSpec extends SparkSpec {

  private def emb = Tables.vectors(spark, sf0001)

  test("L2 kNN ranks are translation-invariant") {
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val shift = transform(col("vec"), _ + lit(3.25f))
    val base = KnnJoin.explodeRanks(KnnJoin(q, b, 5, Metric.L2))
      .select("query_id", "rank", "base_id")
    val shifted = KnnJoin.explodeRanks(KnnJoin(
      q.withColumn("vec", shift), b.withColumn("vec", shift), 5, Metric.L2))
      .select("query_id", "rank", "base_id")
    assert(base.exceptAll(shifted).isEmpty && shifted.exceptAll(base).isEmpty)
  }

  test("cosine kNN ranks are scale-invariant") {
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val scaled = transform(col("vec"), _ * lit(7.5f))
    val base = KnnJoin.explodeRanks(KnnJoin(q, b, 5, Metric.Cosine))
      .select("query_id", "rank", "base_id")
    val s2 = KnnJoin.explodeRanks(KnnJoin(
      q.withColumn("vec", scaled), b.withColumn("vec", scaled), 5, Metric.Cosine))
      .select("query_id", "rank", "base_id")
    assert(base.exceptAll(s2).isEmpty && s2.exceptAll(base).isEmpty)
  }

  test("empty query set is rejected with a clear error") {
    val q = emb.filter(col("id") < 0)
    val b = emb.filter(col("id") >= 10)
    val e = intercept[IllegalArgumentException] {
      KnnJoin(q, b, 5, Metric.L2).collect()
    }
    assert(e.getMessage.contains("empty query set"))
  }

  test("ragged vectors are rejected by VecStore") {
    val e = intercept[IllegalArgumentException] {
      VecStore(Array(Array(1f, 2f), Array(1f, 2f, 3f)), Metric.L2)
    }
    assert(e.getMessage.contains("ragged"))
  }
}
