package graft.tools

import graft.core.Metric
import graft.eval.Eval
import graft.ops.{KnnJoin, Quantize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment harness for the PQ recall levers (OPQ design work):
  * sweeps Lloyd iterations, train-set cap, and rotation variants
  * (none / Hadamard / variance-balancing permutation) on the sfDir
  * embeddings, printing recall@10 per configuration. Not part of the
  * query surface; kept as a tool so the measurements are reproducible.
  *
  * {{{ runMain graft.tools.PqLab --dir /root/testdata/sf0.01 }}}
  */
object PqLab {

  /** Experiment wrappers over the production OPQ pieces (Quantize.
    * opqRotate / opqPermutation / permute); `signFlip=false` keeps a
    * plain-Hadamard arm in the sweep for comparison. */
  def hadamard(vectors: DataFrame, dim: Int, signFlip: Boolean): DataFrame =
    if (signFlip) Quantize.opqRotate(vectors, dim)
    else {
      // plain Hadamard (no sign pre-flip): inline variant for the lab only
      val scale = 1.0 / math.sqrt(dim.toDouble)
      val rot = transform(sequence(lit(0), lit(dim - 1)), i =>
        (aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (acc, j) => acc +
            when(bit_count(i.bitwiseAND(j)) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
              * element_at(col("vec"), j + 1).cast("double"))
          * lit(scale)).cast("float"))
      vectors.select(col("id"), rot.as("vec"))
    }

  def variancePerm(train: DataFrame, dim: Int, m: Int): Array[Int] =
    Quantize.opqPermutation(train, dim, m)

  def applyPerm(vectors: DataFrame, perm: Array[Int]): DataFrame =
    Quantize.permute(vectors, perm)

  def main(args: Array[String]): Unit = {
    val a = Tools.parseArgs(args)
    val dir = a.getOrElse("dir", "/root/testdata/sf0.01")
    val spark = Tools.session()
    import graft.ops.graph.PlanUtil

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q0 = emb.filter(col("id") < 20).cache()
    val b0 = emb.filter(col("id") >= 20).cache()
    val dim = b0.select(size(col("vec"))).head().getInt(0)
    val nBase = b0.count()
    println(s"dim=$dim base=$nBase")

    val K = 10
    val gt = KnnJoin(q0, b0, K, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids")).cache()
    gt.count()

    def trainSet(b: DataFrame, cap: Int): DataFrame =
      PlanUtil.cutDF(b.orderBy("id").limit(cap)).repartition(col("id"))

    def recallOf(q: DataFrame, b: DataFrame, m: Int, kc: Int, iters: Int,
                 cap: Int): Double = {
      val cb = Quantize.pqTrain(trainSet(b, cap), m, kc, iters)
      val codes = Quantize.pqEncode(b, cb, m)
      val rec = Quantize.pqReconstruct(codes, cb)
      val approx = KnnJoin(q, rec, K, Metric.L2)
        .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
      Eval.recallAtK(approx, gt, K).head().getDouble(0)
    }

    val m = 16; val kc = 256
    val configs = Seq(
      ("baseline i2 c2048", () => recallOf(q0, b0, m, kc, 2, 2048)),
      ("i6 c2048", () => recallOf(q0, b0, m, kc, 6, 2048)),
      ("i10 c4096", () => recallOf(q0, b0, m, kc, 10, 4096)),
      ("i6 cap=all", () => recallOf(q0, b0, m, kc, 6, nBase.toInt)),
      ("perm i2", () => {
        val perm = variancePerm(trainSet(b0, 2048), dim, m)
        recallOf(applyPerm(q0, perm), applyPerm(b0, perm), m, kc, 2, 2048)
      }),
      ("perm i6", () => {
        val perm = variancePerm(trainSet(b0, 2048), dim, m)
        recallOf(applyPerm(q0, perm), applyPerm(b0, perm), m, kc, 6, 2048)
      }),
      ("hadamard i6", () => {
        val qh = hadamard(q0, dim, signFlip = false).cache()
        val bh = hadamard(b0, dim, signFlip = false).cache()
        recallOf(qh, bh, m, kc, 6, 2048)
      }),
      ("hadamard+flip+perm i6", () => {
        val qh = hadamard(q0, dim, signFlip = true).cache()
        val bh = hadamard(b0, dim, signFlip = true).cache()
        val perm = variancePerm(trainSet(bh, 2048), dim, m)
        recallOf(applyPerm(qh, perm), applyPerm(bh, perm), m, kc, 6, 2048)
      }),
      ("m8 i6 (8x8d, 32x)", () => recallOf(q0, b0, 8, kc, 6, 2048)),
    )

    // refine stage: ADC top-R candidates, exact re-rank of those R rows only
    def recallRerank(q: DataFrame, b: DataFrame, qOrig: DataFrame,
                     bOrig: DataFrame, iters: Int, r: Int): Double = {
      val cb = Quantize.pqTrain(trainSet(b, 2048), m, kc, iters)
      val codes = Quantize.pqEncode(b, cb, m)
      val cand = Quantize.adcTopK(q, codes, cb, r)
        .select(col("query_id"), explode(col("knn")("id")).as("id"))
      val rer = cand.join(bOrig, "id")
        .join(qOrig.select(col("id").as("query_id"), col("vec").as("qvec")),
          "query_id")
        .withColumn("d", graft.functions.VectorFunctions.l2Sq(col("vec"), col("qvec")))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(col("d"), col("id"))))
        .filter(col("rnk") <= K)
        .groupBy("query_id").agg(collect_list(col("id")).as("ids"))
      Eval.recallAtK(rer, gt, K).head().getDouble(0)
    }
    val rrConfigs = Seq(20, 40, 80).flatMap { r =>
      Seq(
        (s"rerank$r i2", () => recallRerank(q0, b0, q0, b0, 2, r)),
        (s"had+flip+perm rerank$r i2", () => {
          val qh = hadamard(q0, dim, signFlip = true).cache()
          val bh = hadamard(b0, dim, signFlip = true).cache()
          val perm = variancePerm(trainSet(bh, 2048), dim, m)
          recallRerank(applyPerm(qh, perm), applyPerm(bh, perm), q0, b0, 2, r)
        }))
    }
    rrConfigs.foreach { case (name, f) =>
      val t0 = System.nanoTime()
      val r = f()
      println(f"$name%-28s recall=$r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    configs.foreach { case (name, f) =>
      val t0 = System.nanoTime()
      val r = f()
      println(f"$name%-26s recall=$r%.4f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
