package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Vector-collection operators from SURVEY.md §2.2/2.3: centroid (F8),
  * entry-point argmin (A7), mean-pool aggregation (A5).
  *
  * All are expressed relationally (posexplode → groupBy) so they scale to
  * arbitrarily many vectors: nothing is collected to the driver, the only
  * shuffles are keyed by (pos) or (label, pos) — at most `dim` ×
  * `numLabels` groups, so the final aggregations are tiny.
  */
object VectorOps {

  /** Per-dimension mean of a vector column (reference: centroid computation
    * src/index_bipartite.cpp:2004-2016). Input (id, vec); output (pos, c). */
  def centroid(vectors: DataFrame): DataFrame =
    vectors.select(posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg(col("x").cast("double")).as("c"))

  /** Node closest to the centroid under squared L2 — the fixed search entry
    * point (src/index_bipartite.cpp:2018-2041). Output: single row (id).
    *
    * Join-based: explode vectors, join the (tiny, dim-rows) centroid on pos,
    * aggregate per id — a map-side-joinable plan (centroid is broadcast). */
  def entryPoint(vectors: DataFrame): DataFrame = {
    val ex = vectors.select(col("id"), posexplode(col("vec")).as(Seq("pos", "x")))
    val cen = centroid(vectors)
    ex.join(broadcast(cen), "pos")
      .groupBy("id")
      .agg(sum((col("x").cast("double") - col("c")) *
        (col("x").cast("double") - col("c"))).as("dist"))
      .orderBy(col("dist").asc, col("id").asc)
      .limit(1)
  }

  /** CLIP4Clip-style mean pooling (reference: prepare_for_clip_webvid.py:
    * 93-101): L2-normalize each vector, average per group, re-normalize.
    * Input (vec, <groupCol>); output (<groupCol>, pos, v) exploded — the
    * pooled vector in exploded form, oracle-friendly.
    *
    * Scale shape: one array-summing partial/final aggregate per group
    * ([[graft.functions.VecMeanAggregator]]) — the shuffle carries at most
    * `numPartitions` array rows per group, not `rows × dim` exploded
    * scalars (a `dim`× shuffle amplification at CLIP dims). Re-normalize
    * and explode are post-aggregation projections on `numGroups` rows. */
  def meanPoolNormalized(vectors: DataFrame, groupCol: String): DataFrame = {
    val pooled = vectors
      .withColumn("nvec", VectorFunctions.l2Normalize(col("vec")))
      .groupBy(groupCol)
      .agg(graft.functions.VecMeanAggregator.meanVec(col("nvec")).as("mvec"))
    // norm lands in its own column first: referencing the aggregate
    // INSIDE the transform lambda would re-evaluate the O(dim) sum per
    // element (CSE does not cross lambda boundaries) — O(dim²) per group
    pooled
      .withColumn("nrm",
        sqrt(aggregate(col("mvec"), lit(0.0), (acc, x) => acc + x * x)))
      .select(col(groupCol), transform(col("mvec"), _ / col("nrm")).as("pv"))
      .select(col(groupCol), posexplode(col("pv")).as(Seq("pos", "v")))
  }

  /** Pairwise distance exposure (F1/F2/F4): for consecutive id pairs,
    * all three metrics plus the norm. Output (id_a, id_b, l2_sq, neg_ip,
    * cos_dist, norm_a). */
  def distancePairs(vectors: DataFrame, maxId: Long): DataFrame = {
    val a = vectors.filter(col("id") % 2 === 0 && col("id") < maxId)
      .select(col("id").as("id_a"), col("vec").as("va"))
    val b = vectors.select(col("id").as("id_b"), col("vec").as("vb"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        VectorFunctions.l2Sq(col("va"), col("vb")).as("l2_sq"),
        VectorFunctions.negIp(col("va"), col("vb")).as("neg_ip"),
        VectorFunctions.cosineDist(col("va"), col("vb")).as("cos_dist"),
        VectorFunctions.l2Norm(col("va")).as("norm_a"))
  }
}
