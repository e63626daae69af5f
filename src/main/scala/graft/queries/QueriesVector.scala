package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.ops.{KnnJoin, VectorOps}
import graft.eval.Eval

/** Vector/ANN operator queries (SURVEY.md §2.2/2.3/2.6) with DuckDB oracles.
  * Conventions: embeddings ids < 20 are the query side, >= 20 the base side;
  * k = 10; all float arithmetic in float64; outputs ordered + rounded(6). */
object QueriesVector {

  private def emb(s: SparkSession, dir: String) = Tables.vectors(s, dir)
  private def qSide(s: SparkSession, dir: String) =
    emb(s, dir).filter(col("id") < 20)
  private def bSide(s: SparkSession, dir: String) =
    emb(s, dir).filter(col("id") >= 20)

  // ---- kNN join (A1) -----------------------------------------------------

  private def knnQuery(metric: Metric)(s: SparkSession, dir: String): DataFrame =
    KnnJoin.explodeRanks(KnnJoin(qSide(s, dir), bSide(s, dir), 10, metric))
      .select(col("query_id"), col("rank"), col("base_id"))
      .orderBy(col("query_id"), col("rank"))

  // IVF-pruned approximate kNN (the bounded 10M-prefix path) at FULL
  // probe: routing becomes a partition of the scored pairs, so the result
  // is row-identical to the exact join and the whole routed kernel
  // (k-means lists, probe sets, per-list scoring) is pinned to the SQL
  // oracle float-for-float; partial-probe agreement is spec-measured
  // (KnnJoinSpec) and soak-measured at 2M.
  private def knnIvfApproxQuery(s: SparkSession, dir: String): DataFrame =
    KnnJoin.explodeRanks(KnnJoin.ivfApprox(qSide(s, dir), bSide(s, dir), 10,
      Metric.L2, nlist = 8, nprobe = 8, kmIters = 2))
      .select(col("query_id"), col("rank"), col("base_id"))
      .orderBy(col("query_id"), col("rank"))

  private def knnOracle(distExpr: String): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |b AS (SELECT vec_id AS bid, embedding AS be FROM embeddings WHERE vec_id >= 20),
       |d AS (SELECT qid, bid, $distExpr AS dist FROM q, b)
       |SELECT qid AS query_id,
       |       CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, bid) AS INT) AS rank,
       |       bid AS base_id
       |FROM d QUALIFY rank <= 10 ORDER BY query_id, rank""".stripMargin

  private val l2SqlDist =
    "list_sum(list_transform(list_zip(qe, be), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
  private val ipSqlDist =
    "-list_sum(list_transform(list_zip(qe, be), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
  private def normSql(v: String) =
    s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
  private val cosSqlDist = s"($ipSqlDist) / (${normSql("qe")} * ${normSql("be")})"

  // ---- centroid (F8) / entry point (A7) ----------------------------------

  private def centroidQuery(s: SparkSession, dir: String): DataFrame =
    VectorOps.centroid(emb(s, dir))
      .select(col("pos"), round(col("c"), 6).as("centroid"))
      .orderBy("pos")

  private val centroidOracle =
    """SELECT CAST(pos AS INT) AS pos, round(avg(x), 6) AS centroid
      |FROM (SELECT generate_subscripts(embedding, 1) - 1 AS pos,
      |             CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
      |GROUP BY pos ORDER BY pos""".stripMargin

  private def entryPointQuery(s: SparkSession, dir: String): DataFrame =
    VectorOps.entryPoint(emb(s, dir)).select(col("id").as("entry_point"))

  private val entryPointOracle =
    """WITH ex AS (SELECT vec_id AS id, generate_subscripts(embedding, 1) - 1 AS pos,
      |                   CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
      |cen AS (SELECT pos, avg(x) AS c FROM ex GROUP BY pos),
      |d AS (SELECT id, sum((x - c) * (x - c)) AS dist
      |      FROM ex JOIN cen USING (pos) GROUP BY id)
      |SELECT id AS entry_point FROM d ORDER BY dist, id LIMIT 1""".stripMargin

  // ---- mean-pool (A5) ----------------------------------------------------

  private def meanPoolQuery(s: SparkSession, dir: String): DataFrame =
    VectorOps.meanPoolNormalized(emb(s, dir), "label")
      .select(col("label"), col("pos"), round(col("v"), 6).as("v"))
      .orderBy("label", "pos")

  private val meanPoolOracle =
    """WITH n AS (SELECT label,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE) /
      |    sqrt(list_sum(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS nvec
      |  FROM embeddings),
      |ex AS (SELECT label, generate_subscripts(nvec, 1) - 1 AS pos, unnest(nvec) AS x FROM n),
      |m AS (SELECT label, pos, avg(x) AS mx FROM ex GROUP BY label, pos),
      |nm AS (SELECT label, sqrt(sum(mx * mx)) AS nrm FROM m GROUP BY label)
      |SELECT m.label AS label, CAST(pos AS INT) AS pos, round(mx / nrm, 6) AS v
      |FROM m JOIN nm USING (label) ORDER BY label, pos""".stripMargin

  // ---- distance kernels (F1/F2/F4) ---------------------------------------

  private def distancesQuery(s: SparkSession, dir: String): DataFrame =
    VectorOps.distancePairs(emb(s, dir), 100)
      .select(col("id_a"), col("id_b"),
        round(col("l2_sq"), 6).as("l2_sq"),
        round(col("neg_ip"), 6).as("neg_ip"),
        round(col("cos_dist"), 6).as("cos_dist"),
        round(col("norm_a"), 6).as("norm_a"))
      .orderBy("id_a")

  private val distancesOracle =
    s"""WITH a AS (SELECT vec_id AS id_a, embedding AS qe FROM embeddings
       |           WHERE vec_id % 2 = 0 AND vec_id < 100),
       |b AS (SELECT vec_id AS id_b, embedding AS be FROM embeddings)
       |SELECT id_a, id_b,
       |  round($l2SqlDist, 6) AS l2_sq,
       |  round($ipSqlDist, 6) AS neg_ip,
       |  round($cosSqlDist, 6) AS cos_dist,
       |  round(${normSql("qe")}, 6) AS norm_a
       |FROM a JOIN b ON id_b = id_a + 1 ORDER BY id_a""".stripMargin

  // ---- recall@k (E1): truncated-dim approx vs full-dim ground truth ------

  private def recallQuery(s: SparkSession, dir: String): DataFrame = {
    // session-shared exact GT (same (q, b, k, metric) join — see
    // QueriesAnn.exactKnn; recomputing it inside each eval query's plan
    // paid the identical join up to 8x per suite)
    val gt = QueriesAnn.exactGt(s, dir)
    val q32 = qSide(s, dir).withColumn("vec", slice(col("vec"), 1, 32))
    val b32 = bSide(s, dir).withColumn("vec", slice(col("vec"), 1, 32))
    val approx = KnnJoin(q32, b32, 10, Metric.L2)
      .select(col("query_id"), transform(col("knn"), _("id")).as("ids"))
    Eval.recallAtK(approx, gt, 10)
      .select(round(col("recall_at_k"), 6).as("recall_at_k"), col("n_queries"))
  }

  private val recallOracle =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |b AS (SELECT vec_id AS bid, embedding AS be FROM embeddings WHERE vec_id >= 20),
       |gt AS (SELECT qid, bid, row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM q, b QUALIFY rnk <= 10),
       |q32 AS (SELECT qid, qe[1:32] AS qe FROM q),
       |b32 AS (SELECT bid, be[1:32] AS be FROM b),
       |ap AS (SELECT qid, bid, row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM q32, b32 QUALIFY rnk <= 10),
       |hits AS (SELECT gt.qid, count(*) AS h
       |         FROM gt JOIN ap ON gt.qid = ap.qid AND gt.bid = ap.bid GROUP BY gt.qid),
       |per AS (SELECT q.qid, coalesce(h, 0) / 10.0 AS recall
       |        FROM (SELECT DISTINCT qid FROM q) q LEFT JOIN hits ON q.qid = hits.qid)
       |SELECT round(avg(recall), 6) AS recall_at_k, count(*) AS n_queries FROM per""".stripMargin

  // ---- embedding QA: per-label norm statistics ---------------------------

  /** Corpus-health stats for an embedding table: vector norm distribution
    * per label — the cheap drift/outlier screen before indexing. */
  private def normStatsQuery(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"),
        graft.functions.VectorFunctions.l2Norm(col("vec")).as("nrm"))
      .groupBy("label")
      .agg(count("*").as("n"), round(avg("nrm"), 6).as("avg_norm"),
        round(min("nrm"), 6).as("min_norm"), round(max("nrm"), 6).as("max_norm"))
      .orderBy("label")

  private val normStatsOracle =
    s"""WITH t AS (SELECT label, ${normSql("embedding")} AS nrm FROM embeddings)
       |SELECT label, count(*) AS n, round(avg(nrm), 6) AS avg_norm,
       |       round(min(nrm), 6) AS min_norm, round(max(nrm), 6) AS max_norm
       |FROM t GROUP BY label ORDER BY label""".stripMargin

  // ---- relative distance error (E2) of LSH-ANN vs exact ------------------

  /** Mean relative distance error (reference ComputeRderr,
    * tests/test_search_roargraph.cpp:38-62) of the LSH-bucketed ANN result
    * against exact kNN distances. Queries whose bucket yields fewer than k
    * results are excluded on both sides (no padding semantics). */
  private def rderrQuery(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val res = graft.ops.AnnSearch.lshTopK(qSide(s, dir), bSide(s, dir), k, Metric.L2)
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("dist")))).as("rd0"))
      .filter(size(col("rd0")) >= k)
      .select(col("query_id"), transform(col("rd0"), _("dist")).as("dists"))
    val gt = QueriesAnn.exactKnn(s, dir)
      .select(col("query_id"), transform(col("knn"), _("dist")).as("dists"))
    Eval.relativeDistError(res, gt, k, "l2")
      .select(round(col("mean_rderr"), 6).as("mean_rderr"))
  }

  private val rderrOracle = {
    val bucket = (0 until graft.ops.AnnSearch.LshBits).map { d =>
      s"(CASE WHEN CAST(embedding[${2 * d + 1}] AS DOUBLE) - CAST(embedding[${2 * d + 2}] AS DOUBLE) >= 0 THEN ${1L << d} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    val probes = ("bucket" +: (0 until graft.ops.AnnSearch.LshBits)
      .map(j => s"xor(bucket, ${1L << j})")).mkString("[", ", ", "]")
    s"""WITH q0 AS (SELECT vec_id AS qid, embedding AS qe, $bucket AS bucket
       |            FROM embeddings WHERE vec_id < 20),
       |q AS (SELECT qid, qe, unnest($probes) AS bucket FROM q0),
       |b AS (SELECT vec_id AS bid, embedding AS be, $bucket AS bucket
       |      FROM embeddings WHERE vec_id >= 20),
       |ap AS (SELECT qid, bid, $l2SqlDist AS dist,
       |         row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM q JOIN b USING (bucket) QUALIFY rnk <= 10),
       |fullq AS (SELECT qid FROM ap GROUP BY qid HAVING count(*) = 10),
       |gt AS (SELECT qid, bid, $l2SqlDist AS dist,
       |         row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM (SELECT qid, qe FROM q0) q, b QUALIFY rnk <= 10),
       |e AS (SELECT ap.qid, abs(ap.dist - gt.dist) / abs(gt.dist) AS err
       |      FROM ap JOIN gt ON ap.qid = gt.qid AND ap.rnk = gt.rnk
       |      JOIN fullq ON fullq.qid = ap.qid),
       |per AS (SELECT qid, sum(err) AS err_sum FROM e GROUP BY qid)
       |SELECT round(avg(err_sum) / 10, 6) AS mean_rderr FROM per""".stripMargin
  }

  // ---- rderr via the gt-with-dists .ibin codec (S3b + E2) ----------------

  /** Same rderr computation, but the ground truth makes a round trip
    * through the reference's gt-with-dists `.ibin` fixture format
    * (include/efanna2e/util.h:129-155): exact kNN → writeGtWithDist →
    * readGtWithDist → E2. Distances quantize to float32 on the way through
    * the file — exactly what happens when evaluating against the
    * reference's own published ground-truth files — so the oracle casts
    * its gt distances to FLOAT too. */
  private def rderrIbinQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 10
    val gt = QueriesAnn.exactKnn(s, dir)
      .select(col("query_id"),
        transform(col("knn"), _("id").cast("int")).as("ids"),
        transform(col("knn"), _("dist").cast("float")).as("dists"))
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_gt_${math.abs(dir.hashCode)}.ibin"
    graft.sources.FbinCodec.writeGtWithDist(
      gt.select(col("query_id").as("id"), col("ids"), col("dists")), tmp)
    // row i of the file ↔ i-th smallest query_id (positional contract)
    val qids = gt.select(col("query_id")).orderBy("query_id").as[Long].collect()
    val mapping = qids.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toSeq.toDF("id", "query_id")
    val gtBack = graft.sources.FbinCodec.readGtWithDist(s, tmp)
      .join(broadcast(mapping), "id")
      .select(col("query_id"), col("dists"))
    val res = graft.ops.AnnSearch.lshTopK(qSide(s, dir), bSide(s, dir), k, Metric.L2)
      .groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("dist")))).as("rd0"))
      .filter(size(col("rd0")) >= k)
      .select(col("query_id"), transform(col("rd0"), _("dist")).as("dists"))
    Eval.relativeDistError(res, gtBack, k, "l2")
      .select(round(col("mean_rderr"), 6).as("mean_rderr"))
  }

  private val rderrIbinOracle = {
    val bucket = (0 until graft.ops.AnnSearch.LshBits).map { d =>
      s"(CASE WHEN CAST(embedding[${2 * d + 1}] AS DOUBLE) - CAST(embedding[${2 * d + 2}] AS DOUBLE) >= 0 THEN ${1L << d} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    val probes = ("bucket" +: (0 until graft.ops.AnnSearch.LshBits)
      .map(j => s"xor(bucket, ${1L << j})")).mkString("[", ", ", "]")
    s"""WITH q0 AS (SELECT vec_id AS qid, embedding AS qe, $bucket AS bucket
       |            FROM embeddings WHERE vec_id < 20),
       |q AS (SELECT qid, qe, unnest($probes) AS bucket FROM q0),
       |b AS (SELECT vec_id AS bid, embedding AS be, $bucket AS bucket
       |      FROM embeddings WHERE vec_id >= 20),
       |ap AS (SELECT qid, bid, $l2SqlDist AS dist,
       |         row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM q JOIN b USING (bucket) QUALIFY rnk <= 10),
       |fullq AS (SELECT qid FROM ap GROUP BY qid HAVING count(*) = 10),
       |gt AS (SELECT qid, bid, CAST($l2SqlDist AS FLOAT) AS dist,
       |         row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |       FROM (SELECT qid, qe FROM q0) q, b QUALIFY rnk <= 10),
       |e AS (SELECT ap.qid, abs(ap.dist - gt.dist) / abs(gt.dist) AS err
       |      FROM ap JOIN gt ON ap.qid = gt.qid AND ap.rnk = gt.rnk
       |      JOIN fullq ON fullq.qid = ap.qid),
       |per AS (SELECT qid, sum(err) AS err_sum FROM e GROUP BY qid)
       |SELECT round(avg(err_sum) / 10, 6) AS mean_rderr FROM per""".stripMargin
  }

  // ---- degree stats (A6) over the kNN-derived reverse graph --------------

  private def degreeStatsQuery(s: SparkSession, dir: String): DataFrame = {
    val knn = KnnJoin.explodeRanks(QueriesAnn.exactKnn(s, dir))
    knn.groupBy("base_id").agg(count("*").as("deg"))
      .agg(count("*").as("n_nodes"), round(avg("deg"), 6).as("avg_degree"),
        max("deg").as("max_degree"), min("deg").as("min_degree"))
  }

  private val degreeStatsOracle =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
       |b AS (SELECT vec_id AS bid, embedding AS be FROM embeddings WHERE vec_id >= 20),
       |knn AS (SELECT qid, bid, row_number() OVER (PARTITION BY qid ORDER BY $l2SqlDist, bid) AS rnk
       |        FROM q, b QUALIFY rnk <= 10),
       |deg AS (SELECT bid, count(*) AS deg FROM knn GROUP BY bid)
       |SELECT count(*) AS n_nodes, round(avg(deg), 6) AS avg_degree,
       |       max(deg) AS max_degree, min(deg) AS min_degree FROM deg""".stripMargin

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_l2" -> knnQuery(Metric.L2) _,
    "knn_ip" -> knnQuery(Metric.InnerProduct) _,
    "knn_cosine" -> knnQuery(Metric.Cosine) _,
    "knn_ivf_approx" -> (knnIvfApproxQuery _),
    "vec_centroid" -> (centroidQuery _),
    "vec_entry_point" -> (entryPointQuery _),
    "vec_mean_pool" -> (meanPoolQuery _),
    "vec_distances" -> (distancesQuery _),
    "knn_recall" -> (recallQuery _),
    "knn_rderr" -> (rderrQuery _),
    "knn_rderr_ibin" -> (rderrIbinQuery _),
    "vec_norm_stats" -> (normStatsQuery _),
    "graph_degree_stats" -> (degreeStatsQuery _),
  )

  val oracles: Map[String, String] = Map(
    "knn_l2" -> knnOracle(l2SqlDist),
    "knn_ip" -> knnOracle(ipSqlDist),
    "knn_cosine" -> knnOracle(cosSqlDist),
    "knn_ivf_approx" -> knnOracle(l2SqlDist),
    "vec_centroid" -> centroidOracle,
    "vec_entry_point" -> entryPointOracle,
    "vec_mean_pool" -> meanPoolOracle,
    "vec_distances" -> distancesOracle,
    "knn_recall" -> recallOracle,
    "knn_rderr" -> rderrOracle,
    "knn_rderr_ibin" -> rderrIbinOracle,
    "vec_norm_stats" -> normStatsOracle,
    "graph_degree_stats" -> degreeStatsOracle,
  )
}
