package graft.tools

import graft.core.Tables
import graft.ops.Quantize
import org.apache.spark.sql.functions._

/** Is pqTrain/pqEncode wall codegen-compile (first-run-only) or
  * per-run structural cost? Run each twice in one session and compare.
  * {{{ runMain graft.tools.PqTrainProbe [sfDir] }}} */
object PqTrainProbe {
  private def lap[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[pq-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tools.session()
    spark.range(100000).selectExpr("sum(id)").collect()
    val emb = Tables.vectors(spark, sfDir)
    val bSide = emb.filter(col("id") >= 20)
    val train = graft.ops.graph.PlanUtil.cutDF(
      bSide.orderBy("id").limit(2048)).repartition(col("id"))
    val rotTrain = Quantize.opqRotate(train, 64)
    val perm = Quantize.opqPermutation(rotTrain, 64, 16)
    val trainP = Quantize.permute(rotTrain, perm).cache()
    val bP = Quantize.permute(Quantize.opqRotate(bSide, 64), perm).cache()
    trainP.count(); bP.count()
    (1 to 3).foreach { i =>
      val cb = lap(s"pqTrain run $i") {
        val c = Quantize.pqTrain(trainP, 16, 256, 1).cache(); c.count(); c
      }
      lap(s"pqEncode run $i") { Quantize.pqEncode(bP, cb, 16).count() }
      cb.unpersist()
    }
    spark.stop()
  }
}
