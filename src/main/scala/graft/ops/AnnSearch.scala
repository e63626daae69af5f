package graft.ops

import graft.core.Metric
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate nearest-neighbor search over an embedding column — the
  * scale path beside the exact kNN join (SURVEY.md A1) and the RoarGraph
  * index (Q1). Two bucketed variants, both pure relational dataflow:
  *
  *   - LSH: deterministic difference-hyperplane sign bits → one bucket per
  *     vector → per-bucket top-k. One shuffle keyed by bucket; the cross
  *     product shrinks by ~2^bits.
  *   - IVF: assign every vector to its nearest centroid (inverted file);
  *     queries probe the `nprobe` nearest centroids' lists only. The
  *     centroid set is an input (k-means is a separate concern); probing
  *     cost scales with nprobe/|centroids|.
  *
  * Both are deterministic and expressible in ANSI SQL (DuckDB-oracle-
  * checkable), unlike random-hyperplane LSH. Recall vs the exact operator
  * is itself a query (Eval.recallAtK) so the quality/cost trade is measured,
  * not guessed.
  */
object AnnSearch {

  /** Number of difference hyperplanes (bucket bits). 2^4 = 16 buckets. */
  val LshBits = 4

  /** Deterministic LSH bucket id: bit d = sign(vec[2d] - vec[2d+1]), the
    * fixed hyperplane family e_{2d} - e_{2d+1} (data-independent, so the
    * same expression works on any engine; 0-indexed dims). */
  def lshBucket(vec: Column, bits: Int = LshBits): Column =
    (0 until bits).map { d =>
      when(vec(2 * d).cast("double") - vec(2 * d + 1).cast("double") >= 0,
        lit(1L << d)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  /** Bucketed top-k with multi-probe: each query competes against its own
    * bucket plus every bucket at Hamming distance 1 (flip one hyperplane
    * bit) — the standard multi-probe LSH recall lift, still one bucket-
    * keyed shuffle scanning (1+bits)/2^bits of the base per query.
    * Output (query_id, rank, base_id, dist). */
  def lshTopK(queries: DataFrame, base: DataFrame, k: Int, metric: Metric,
              bits: Int = LshBits): DataFrame = {
    val metricName = metric match {
      case Metric.L2 => "l2"; case Metric.InnerProduct => "ip"
      case Metric.Cosine => "cosine"
    }
    val qb = lshBucket(col("vec"), bits)
    val probeList = array(qb +: (0 until bits).map(j => qb.bitwiseXOR(lit(1L << j))): _*)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      explode(probeList).as("bucket"))
    val b = base.select(col("id").as("base_id"), col("vec").as("bvec"),
      lshBucket(col("vec"), bits).as("bucket"))
    val scored = q.join(b, "bucket")
      .withColumn("dist",
        VectorFunctions.distByMetric(metricName)(col("qvec"), col("bvec")))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("base_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("base_id"), col("dist"))
  }

  /** Deterministic Lloyd's k-means over the vector table — the IVF
    * centroid trainer. Pure relational dataflow per iteration: assign =
    * broadcast-centroids crossJoin + per-id argmin window; update = explode
    * to (cluster, pos, x) and groupBy average. Seeding is deterministic
    * (the k vectors with smallest ids), so results are reproducible.
    * Empty clusters keep their previous centroid. Returns
    * (centroid_id, vec: array<float>). */
  def kMeans(vectors: DataFrame, k: Int, iters: Int = 10): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val v = vectors.select(col("id").cast("long"), col("vec")).cache()
    var centroids = v.orderBy("id").limit(k)
      .orderBy("id").collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](1).toArray) }
    var it = 0
    while (it < iters) {
      val cdf = centroids.toSeq.toDF("centroid_id", "vec")
      val assigned = assignToCentroids(v, cdf)
        .select(col("centroid_id"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("centroid_id")
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("centroid_id"),
          transform(col("ms"), _("m").cast("float")).as("vec"))
        .as[(Int, Array[Float])].collect().toMap
      centroids = centroids.map { case (cid, old) =>
        (cid, assigned.getOrElse(cid, old))
      }
      it += 1
    }
    v.unpersist()
    centroids.toSeq.toDF("centroid_id", "vec")
  }

  /** Assign each vector to its nearest centroid (L2): the IVF inverted
    * list. `centroids` must expose (centroid_id, vec). Broadcast join —
    * centroid sets are small by construction. */
  def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val c = centroids.select(col("centroid_id"), col("vec").as("cvec"))
    val scored = vectors.crossJoin(broadcast(c))
      .withColumn("cdist", VectorFunctions.l2Sq(col("vec"), col("cvec")))
    val w = Window.partitionBy("id").orderBy(col("cdist").asc, col("centroid_id").asc)
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .drop("cvec", "crank")
  }

  /** IVF top-k: base vectors are grouped by nearest centroid; each query
    * probes the `nprobe` nearest centroids' lists. Output
    * (query_id, rank, base_id, dist). */
  def ivfTopK(queries: DataFrame, base: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int, metric: Metric): DataFrame = {
    val metricName = metric match {
      case Metric.L2 => "l2"; case Metric.InnerProduct => "ip"
      case Metric.Cosine => "cosine"
    }
    val c = centroids.select(col("centroid_id"), col("vec").as("cvec"))
    // inverted lists
    val lists = assignToCentroids(
      base.select(col("id"), col("vec")), centroids)
      .select(col("centroid_id"), col("id").as("base_id"), col("vec").as("bvec"))
    // query → nprobe nearest centroids
    val qc = queries.select(col("id").as("query_id"), col("vec").as("qvec"))
      .crossJoin(broadcast(c))
      .withColumn("cdist", VectorFunctions.l2Sq(col("qvec"), col("cvec")))
    val wq = Window.partitionBy("query_id").orderBy(col("cdist").asc, col("centroid_id").asc)
    val probes = qc.withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("centroid_id"))
    // search only the probed lists
    val scored = probes.join(lists, "centroid_id")
      .withColumn("dist",
        VectorFunctions.distByMetric(metricName)(col("qvec"), col("bvec")))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("base_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("base_id"), col("dist"))
  }
}
