package graft.tools

import graft.core.Tables
import graft.ops.Quantize
import org.apache.spark.sql.functions._

/** Step-level laps for the ann_pq200_codes chain (mirrors
  * QueriesAnn.pq200CodesQuery), twice in one session to split
  * codegen-compile from structural cost.
  * {{{ runMain graft.tools.Pq200Probe [sfDir] }}} */
object Pq200Probe {
  private def lap[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pq200-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tools.session()
    spark.range(100000).selectExpr("sum(id)").collect()
    val emb = Tables.vectors(spark, sfDir)
    val bSide = emb.filter(col("id") >= 20)
    def vec200(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), concat(
        col("vec"),
        transform(col("vec"), x => -x),
        transform(col("vec"), x => x * lit(0.5f)),
        slice(col("vec"), 1, 8)).as("vec"))
    (1 to 2).foreach { i =>
      val b200 = vec200(bSide)
      val train = lap(s"$i trainSet cut") {
        graft.ops.graph.PlanUtil.cutDF(
          b200.orderBy("id").limit(256))
      }
      val rotTrain = Quantize.opqRotate(train, 200)
      val perm = lap(s"$i opqPermutation") {
        Quantize.opqPermutation(rotTrain, 256, 8)
      }
      val trainP = Quantize.opqRotatePermuted(train, 200, perm).cache()
      lap(s"$i trainP materialize") { trainP.count() }
      val bP = Quantize.opqRotatePermuted(b200, 200, perm).cache()
      lap(s"$i bP materialize") { bP.count() }
      val cb = lap(s"$i pqTrain m=8 k=16") { Quantize.pqTrain(trainP, 8, 16, 1) }
      lap(s"$i pqEncode+select") {
        Quantize.pqEncode(bP, cb, 8)
          .select(col("id") +:
            (0 until 8).map(s => element_at(col("codes"), s + 1).as(s"k$s")): _*)
          .orderBy("id").count()
      }
      trainP.unpersist(); bP.unpersist()
    }
    spark.stop()
  }
}
