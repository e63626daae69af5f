package graft.tools

import graft.core.Metric
import graft.ops.{KnnJoin, Quantize}
import org.apache.spark.sql.functions._

/** Phase timing for the ann_pq_recall pipeline — which stage costs what.
  * {{{ runMain graft.tools.PqProfile <sfDir> }}} */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tools.session()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE,$name,${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 20)
    val b = emb.filter(col("id") >= 20)
    spark.range(10).count()

    val trainSet = graft.ops.graph.PlanUtil.cutDF(
      b.orderBy("id").limit(2048)).repartition(col("id"))
    val rotTrain = t("rotTrain+mat") {
      val r = Quantize.opqRotate(trainSet, 64).cache(); r.count(); r
    }
    val perm = t("perm") { Quantize.opqPermutation(rotTrain, 64, 16) }
    val bP = t("rotBase+mat") {
      val r = Quantize.permute(Quantize.opqRotate(b, 64), perm).cache()
      r.count(); r
    }
    val qP = t("rotQ+mat") {
      val r = Quantize.permute(Quantize.opqRotate(q, 64), perm).cache()
      r.count(); r
    }
    val trainP = Quantize.permute(rotTrain, perm).cache()
    val cb = t("train") {
      val r = Quantize.pqTrain(trainP, 16, 256, 2).cache(); r.count(); r
    }
    val codes = t("encode") {
      val r = Quantize.pqEncode(bP, cb, 16).cache(); r.count(); r
    }
    val cand = t("adc40") {
      val r = Quantize.adcTopK(qP, codes, cb, 40).cache(); r.count(); r
    }
    val refined = t("refine") {
      val r = Quantize.refineTopK(cand, q, b, 10)
        .select(col("query_id"), transform(col("knn"), _("id")).as("ids")).cache()
      r.count(); r
    }
    val gt = t("gtKnn") {
      val r = KnnJoin(q, b, 10, Metric.L2)
        .select(col("query_id"), transform(col("knn"), _("id")).as("ids")).cache()
      r.count(); r
    }
    t("recall") {
      println(graft.eval.Eval.recallAtK(refined, gt, 10).head())
    }
    spark.stop()
  }
}
