package graft

import graft.core.{Metric, Tables}
import graft.ops.KnnJoin
import org.apache.spark.sql.functions._

class KnnJoinSpec extends SparkSpec {

  private def roundTrip(metric: Metric): Unit = {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val fast = KnnJoin.explodeRanks(KnnJoin(q, b, 5, metric))
      .select("query_id", "rank", "base_id")
    val ref = KnnJoin.crossWindow(q, b, 5, metric)
      .select("query_id", "rank", "base_id")
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
      s"bruteForce != crossWindow for $metric")
  }

  test("bruteForce matches crossWindow reference plan (L2)") {
    roundTrip(Metric.L2)
  }
  test("bruteForce matches crossWindow reference plan (IP)") {
    roundTrip(Metric.InnerProduct)
  }
  test("bruteForce matches crossWindow reference plan (cosine)") {
    roundTrip(Metric.Cosine)
  }

  test("query blocking (tiled broadcast) gives identical results") {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 10)
    val b = emb.filter(col("id") >= 10)
    val whole = KnnJoin(q, b, 5, Metric.L2, queryBlockRows = 100000)
    val tiled = KnnJoin(q, b, 5, Metric.L2, queryBlockRows = 3)
    val a = KnnJoin.explodeRanks(whole).select("query_id", "rank", "base_id")
    val c = KnnJoin.explodeRanks(tiled).select("query_id", "rank", "base_id")
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("knn results are sorted by (dist, id) and bounded by k") {
    val emb = Tables.vectors(spark, sf0001)
    val q = emb.filter(col("id") < 5)
    val b = emb.filter(col("id") >= 5)
    val rows = KnnJoin(q, b, 7, Metric.L2).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val knn = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("knn")
      assert(knn.length == 7)
      val pairs = knn.map(n => (n.getAs[Double]("dist"), n.getAs[Long]("id")))
      assert(pairs == pairs.sortBy(identity))
    }
  }

  test("BoundedTopK keeps k smallest with (dist, id) tie-break") {
    val h = new KnnJoin.BoundedTopK(3)
    Seq((5.0, 1L), (1.0, 9L), (1.0, 2L), (3.0, 7L), (0.5, 4L), (9.0, 0L))
      .foreach { case (d, i) => h.push(d, i) }
    assert(h.result().toSeq == Seq((0.5, 4L), (1.0, 2L), (1.0, 9L)))
  }
}
