package graft.tools

import graft.core.{BuildParams, Metric, SearchParams}
import graft.ops.KnnJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what an APPROXIMATE train→base kNN prefix costs in final
  * index quality (VERDICT r8 #5's second half): same corpus, same train
  * set, two in-RAM RoarGraph builds whose ONLY difference is the
  * precomputed kNN lists — exact [[KnnJoin]] vs IVF-pruned
  * [[KnnJoin.ivfApprox]] — searched with the same eval queries against
  * the same exact ground truth. The in-RAM builder is the measured
  * quality proxy for the distributed tier (SCALE.md round-5 table: the
  * two tiers build quality-identical graphs from the same inputs), so
  * the recall delta here is the delta the 10M distributed build would
  * inherit from switching its prefix to `--trainKnn approx`.
  *
  * {{{
  * SPARK_GRAFT_CPUS=8 java -Xmx12g ... graft.tools.TrainKnnQuality \
  *   --n 500000 --dim 128 --trainQ 25000 --nlist 1024 --nprobe 128
  * }}}
  * Prints one JSON line with both recalls, the list agreement, and both
  * prefix walls.
  */
object TrainKnnQuality {

  def main(args: Array[String]): Unit = {
    val a = Tools.parseArgs(args)
    val n = a.getOrElse("n", "500000").toLong
    val dim = a.getOrElse("dim", "128").toInt
    val trainQ = a.getOrElse("trainQ", "25000").toInt
    val evalQ = a.getOrElse("evalQ", "200").toInt
    val nlist = a.getOrElse("nlist", "1024").toInt
    val nprobe = a.getOrElse("nprobe", "128").toInt
    val mSq = a.getOrElse("mSq", "32").toInt
    val l = a.getOrElse("l", "300").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", a.getOrElse("shuffle", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.ops.graph.PlanUtil.cutDF(
      ScaleSoak.corpus(spark, n, seed = 0x5EEDL, dim = dim))
    val train = graft.ops.graph.PlanUtil.cutDF(
      ScaleSoak.corpus(spark, trainQ, seed = 0x77AA11L, dim = dim))
    val eval = ScaleSoak.corpus(spark, evalQ, seed = 0xE7A1L,
      idOffset = 10_000_000L, dim = dim).cache()

    def prefix(mode: String): (org.apache.spark.sql.DataFrame, Double) = {
      val t0 = System.nanoTime()
      val lists =
        if (mode == "exact") KnnJoin(train, base, mSq, Metric.L2)
        else KnnJoin.ivfApprox(train, base, mSq, Metric.L2, nlist, nprobe)
      val cut = graft.ops.graph.PlanUtil.cutDF(
        lists.select(col("query_id"), transform(col("knn"), _("id")).as("knn")))
      (cut, (System.nanoTime() - t0) / 1e9)
    }
    val (exactKnn, exactSec) = prefix("exact")
    println(f"[tkq] exact prefix $exactSec%.1f s")
    val (approxKnn, approxSec) = prefix("approx")
    println(f"[tkq] approx prefix $approxSec%.1f s")
    val joined = exactKnn.select(col("query_id"), col("knn").as("e"))
      .join(approxKnn.select(col("query_id"), col("knn").as("a")), "query_id")
      .cache()
    val agree = joined
      .select((size(array_intersect(col("e"), col("a"))).cast("double") /
        size(col("e"))).as("ov"))
      .agg(avg(col("ov"))).head().getDouble(0)
    // ORDERED equality, not just set overlap: identical lists make the
    // downstream build IDENTICAL by determinism (DistRoarGraphSpec pins
    // build determinism), so quality delta is zero by construction
    val nDiff = joined.filter(col("e") =!= col("a")).count()
    joined.unpersist()
    println(f"[tkq] list agreement $agree%.4f, $nDiff differing lists of $trainQ")
    if (a.contains("skipBuild")) {
      println(f"""[tkq] {"n":$n,"dim":$dim,"trainQ":$trainQ,"nlist":$nlist,"nprobe":$nprobe,"k":$mSq,"exact_prefix_sec":$exactSec%.1f,"approx_prefix_sec":$approxSec%.1f,"speedup":${exactSec / approxSec}%.2f,"agreement":$agree%.4f,"differing_lists":$nDiff}""")
      spark.stop()
      return
    }

    val gt = KnnJoin(eval, base, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids")).cache()
    gt.count()

    val params = BuildParams(
      mSq = mSq,
      mPjbp = a.getOrElse("mPjbp", "32").toInt,
      lPjpq = a.getOrElse("lPjpq", "48").toInt, metric = Metric.L2)
    def buildAndScore(knn: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val dense = knn.select(col("query_id"),
        transform(col("knn"), _.cast("int")).as("knn"))
      val t0 = System.nanoTime()
      val idx = graft.build.RoarGraphBuilder.build(base, train, params, Some(dense))
      val buildSec = (System.nanoTime() - t0) / 1e9
      val res = graft.build.RoarGraphBuilder.searchBatch(idx, eval,
        SearchParams(k = 10, lPq = l, metric = Metric.L2))
        .select(col("query_id"), col("ids"))
      val recall = graft.eval.Eval.recallAtK(res, gt, 10)
        .head().getAs[Double]("recall_at_k")
      (recall, buildSec)
    }
    val (rExact, bExact) = buildAndScore(exactKnn)
    println(f"[tkq] exact-prefix build recall@10 $rExact%.4f ($bExact%.1f s)")
    val (rApprox, bApprox) = buildAndScore(approxKnn)
    println(f"[tkq] approx-prefix build recall@10 $rApprox%.4f ($bApprox%.1f s)")

    println(f"""[tkq] {"n":$n,"dim":$dim,"trainQ":$trainQ,"nlist":$nlist,"nprobe":$nprobe,"k":$mSq,"l":$l,"exact_prefix_sec":$exactSec%.1f,"approx_prefix_sec":$approxSec%.1f,"speedup":${exactSec / approxSec}%.2f,"agreement":$agree%.4f,"recall_exact_prefix":$rExact%.4f,"recall_approx_prefix":$rApprox%.4f,"delta":${rExact - rApprox}%.4f}""")
    spark.stop()
  }
}
