package graft.queries

import graft.core.{Metric, Tables}
import graft.ops.{KnnJoin, NearDup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection queries with DuckDB oracles generated from the
  * SAME constants as the Spark operators (NearDup.*) — hash params, band
  * layout, and thresholds can never drift between engine and oracle. */
object QueriesDedup {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def emb(s: SparkSession, dir: String) = Tables.vectors(s, dir)

  import NearDup.{Bands, CharBase, HashMod, MinHashParams, RowsPerBand,
    ShingleSize, SimHashBits, SimHashChunks}

  // ---- shared SQL fragments (mirror NearDup building blocks) -------------

  /** char-level poly hash of string expr `e`, mod HashMod. */
  private[queries] def charHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, x) -> (a * $CharBase + x) % $HashMod)"

  /** sorted distinct shingle hashes of `toks` (a list<varchar> expr). */
  private[queries] def shinglesSql(toks: String): String = {
    val n = ShingleSize
    s"list_sort(list_distinct(list_transform(" +
      s"[array_to_string($toks[i:i+${n - 1}], ' ') " +
      s"for i in range(1, greatest(len($toks) - ${n - 1}, 0) + 1)], " +
      s"s -> ${charHashSql("s")})))"
  }

  private[queries] def sigSql(sh: String): String =
    MinHashParams.map { case (a, b) =>
      s"list_min(list_transform($sh, x -> (x * $a + $b) % $HashMod))"
    }.mkString("[", ", ", "]")

  /** band keys from a sig list expr (1-indexed in DuckDB). */
  private[queries] def bandKeysSql(sig: String): String =
    (0 until Bands).map { bnd =>
      (0 until RowsPerBand).map(r => s"$sig[${bnd * RowsPerBand + r + 1}]")
        .reduceLeft((acc, x) => s"($acc * $HashMod + $x)")
    }.mkString("[", ", ", "]")

  // ---- minhash signatures (per-doc, the cheap single-pass stage) ---------

  // exploded to scalar columns (doc_id, hash_idx, minhash): the driver's
  // pandas hash canonicalizer cannot sort array cells, so the per-function
  // minhash values are emitted one row each.
  private def minhashSigQuery(s: SparkSession, dir: String): DataFrame =
    // materialize signatures BEFORE exploding: with a single reference the
    // optimizer inlines the whole signature expression into the Generate,
    // whose evaluation path is ~10× slower than the codegen'd projection
    graft.ops.graph.PlanUtil.cutDF(
        NearDup.signatures(docs(s, dir)).select("doc_id", "sig"))
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("hash_idx", "minhash")))
      .orderBy("doc_id", "hash_idx")

  private val minhashSigOracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, ${shinglesSql("toks")} AS sh FROM t),
       |g AS (SELECT doc_id, ${sigSql("sh")} AS sig FROM s)
       |SELECT doc_id,
       |  CAST(unnest(range(0, len(sig))) AS INT) AS hash_idx,
       |  CAST(unnest(sig) AS BIGINT) AS minhash
       |FROM g ORDER BY doc_id, hash_idx""".stripMargin

  // ---- MinHash-LSH near-dup pairs ----------------------------------------

  private val JaccardThreshold = 0.5

  private def minhashLshQuery(s: SparkSession, dir: String): DataFrame =
    NearDup.minHashLsh(docs(s, dir), JaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  private val minhashLshOracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, ${shinglesSql("toks")} AS sh FROM t),
       |g AS (SELECT doc_id, sh, ${sigSql("sh")} AS sig FROM s),
       |bands AS (SELECT doc_id, unnest(${bandKeysSql("sig")}) AS key,
       |                 unnest(range(0, $Bands)) AS band FROM g),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b,
       |        CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |          / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
       |      FROM cand JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b)
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM j
       |WHERE jaccard >= $JaccardThreshold ORDER BY id_a, id_b""".stripMargin

  // ---- SimHash ------------------------------------------------------------

  // 24-bit simhash over shared-vocab synthetic docs is coarse: hamming<=1
  // keeps the output set meaningfully "near-dup" (0 → 203 pairs at sf0.01)
  private val MaxHamming = 1

  private def simhashQuery(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), NearDup.simHash(col("text")).as("simhash"))
      .orderBy("doc_id")

  private def simhashSql(toks: String): String = {
    val hs = s"list_transform($toks, s -> ${charHashSql("s")})"
    val terms = (0 until SimHashBits).map { b =>
      s"(CASE WHEN 2 * list_sum(list_transform(hs, h -> (h >> $b) & 1)) >= len(hs) " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")
    s"(SELECT $terms FROM (SELECT $hs AS hs))"
  }

  private val simhashOracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id, ${simhashSql("toks")} AS simhash
       |FROM t ORDER BY doc_id""".stripMargin

  private def simhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    NearDup.simHashPairs(docs(s, dir), MaxHamming).orderBy("id_a", "id_b")

  private val simhashPairsOracle = {
    val bitsPerChunk = SimHashBits / SimHashChunks
    val chunks = (0 until SimHashChunks)
      .map(c => s"((simhash >> ${c * bitsPerChunk}) & ${(1L << bitsPerChunk) - 1})")
      .mkString("[", ", ", "]")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id, ${simhashSql("toks")} AS simhash FROM t),
       |banded AS (SELECT doc_id, simhash, unnest($chunks) AS key,
       |                  unnest(range(0, $SimHashChunks)) AS chunk FROM sh),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                bit_count(xor(a.simhash, b.simhash)) AS hamming
       |         FROM banded a JOIN banded b
       |           ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM cand
       |WHERE hamming <= $MaxHamming ORDER BY id_a, id_b""".stripMargin
  }

  // ---- embedding-cosine near-dup -----------------------------------------

  // synthetic embeddings have no planted dups (max pairwise cosine ≈ 0.51);
  // 0.45 ≈ p95 of top-1 sims keeps the operator's output non-trivial
  private val CosineSimThreshold = 0.45
  private val NearDupK = 6

  /** Near-dup vectors: for each embedding, its kNN under cosine; keep pairs
    * with similarity ≥ threshold, canonicalized (id_a < id_b). Built on the
    * exact kNN join — at scale the LSH/IVF ANN variant replaces the join. */
  private def embNearDupQuery(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    KnnJoin.explodeRanks(KnnJoin(e, e, NearDupK, Metric.Cosine))
      .filter(col("base_id") =!= col("query_id"))
      .withColumn("cos_sim", -col("dist"))
      .filter(col("cos_sim") >= CosineSimThreshold)
      .select(least(col("query_id"), col("base_id")).as("id_a"),
        greatest(col("query_id"), col("base_id")).as("id_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
      .distinct()
      .orderBy("id_a", "id_b")
  }

  private val embNearDupOracle = {
    val ip = "list_sum(list_transform(list_zip(qe, be), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    def nrm(v: String) = s"sqrt(list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings),
       |b AS (SELECT vec_id AS bid, embedding AS be FROM embeddings),
       |d AS (SELECT qid, bid, ($ip) / (${nrm("qe")} * ${nrm("be")}) AS sim,
       |        row_number() OVER (PARTITION BY qid
       |          ORDER BY -(($ip) / (${nrm("qe")} * ${nrm("be")})), bid) AS rnk
       |      FROM q, b QUALIFY rnk <= $NearDupK),
       |p AS (SELECT DISTINCT least(qid, bid) AS id_a, greatest(qid, bid) AS id_b,
       |             round(sim, 6) AS cos_sim
       |      FROM d WHERE bid != qid AND sim >= $CosineSimThreshold)
       |SELECT id_a, id_b, cos_sim FROM p ORDER BY id_a, id_b""".stripMargin
  }

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_sig" -> (minhashSigQuery _),
    "dedup_minhash_lsh" -> (minhashLshQuery _),
    "dedup_simhash" -> (simhashQuery _),
    "dedup_simhash_pairs" -> (simhashPairsQuery _),
    "dedup_embedding" -> (embNearDupQuery _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_minhash_sig" -> minhashSigOracle,
    "dedup_minhash_lsh" -> minhashLshOracle,
    "dedup_simhash" -> simhashOracle,
    "dedup_simhash_pairs" -> simhashPairsOracle,
    "dedup_embedding" -> embNearDupOracle,
  )
}
