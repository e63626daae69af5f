package graft.tools

import graft.ops.Quantize
import org.apache.spark.sql.functions._

/** Phase timing for the ann_pq200_codes chain (the zero-padded OPQ path
  * at the reference's 200-d regime) — which stage costs what.
  * {{{ runMain graft.tools.Pq200Profile <sfDir> }}} */
object Pq200Profile {
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
    val b = emb.filter(col("id") >= 20)
    spark.range(10).count()

    val b200 = b.select(col("id"), concat(
      col("vec"),
      transform(col("vec"), x => -x),
      transform(col("vec"), x => x * lit(0.5f)),
      slice(col("vec"), 1, 8)).as("vec"))
    val train = t("trainCut") {
      val r = graft.ops.graph.PlanUtil.cutDF(
        b200.orderBy("id").limit(256)).repartition(col("id"))
      r.count(); r
    }
    val rotTrain = t("rotTrain") {
      val r = Quantize.opqRotate(train, 200).cache(); r.count(); r
    }
    val perm = t("perm") { Quantize.opqPermutation(rotTrain, 256, 8) }
    val trainP = t("trainP+mat") {
      val r = Quantize.permute(rotTrain, perm).cache(); r.count(); r
    }
    val bP = t("rotBase+mat") {
      val r = Quantize.permute(Quantize.opqRotate(b200, 200), perm).cache()
      r.count(); r
    }
    val cb = t("train") {
      val r = Quantize.pqTrain(trainP, 8, 16, iters = 1).cache(); r.count(); r
    }
    t("encode") {
      Quantize.pqEncode(bP, cb, 8).orderBy("id").count()
    }
    spark.stop()
  }
}
