package graft.queries

import graft.core.Tables
import graft.ops.{Dedup, NearDup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline — the engine's end-to-end story:
  *
  *   corpus → exact dedup (keep min-id per content hash)
  *          → quality filter (token count, stopword ratio)
  *          → near-dup removal (MinHash-LSH pairs; drop the higher id)
  *          → surviving document ids.
  *
  * Every stage is one of the already-verified operators; the composition
  * itself is hash-checked against a DuckDB oracle built from the same
  * constants. At 100 TB this is exactly three corpus passes: a hash
  * shuffle, a column-expression scan, and the LSH band shuffle — the text
  * never moves after the scan. */
object QueriesPipeline {

  private val MinTokens = 20
  private val MaxStopwordRatio = 0.5
  private val JaccardThreshold = 0.5

  private def pipelineQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).cache()
    // stage 1: exact dedup keepers
    val keepers = Dedup.dedupIds(docs)
    val d1 = docs.join(keepers, "doc_id")
    // stage 2 FUSED into a row-local filter over d1 (guide §1.2/§2.4): the
    // previous shape aggregated qualityStats(d1) into a doc_id list and
    // joined it back onto d1 — re-evaluating the whole d1 subtree a second
    // time and paying an extra join exchange for a predicate that only
    // reads the row's own tokens. Same predicate expressions as
    // TextOps.qualityStats (n_tokens >= MinTokens, stopword_ratio <=
    // MaxStopwordRatio over split(text, ' ')); doc_id unique on both
    // shapes, so row set and multiplicity are identical (tri-SF
    // oracle-gated).
    val toks = col("_toks")
    val stop = array(TextOps.Stopwords.map(lit): _*)
    val d2 = d1.select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("_toks"))
      .filter(size(toks) >= MinTokens &&
        (size(filter(toks, x => array_contains(stop, x))).cast("double")
          / size(toks)) <= MaxStopwordRatio)
      .select("doc_id", "text")
    // survivors materialized ONCE: the LSH stage (which re-reads its input
    // for signatures) and the final anti-join both consume this set — the
    // previous shape recomputed the d1→d2 chain for each consumer
    val d2c = graft.ops.graph.PlanUtil.cutDF(d2)
    // stage 3: near-dup removal — drop the higher id of every LSH pair
    val losers = NearDup.minHashLsh(d2c, JaccardThreshold)
      .select(col("id_b").as("doc_id")).distinct()
    // left_anti, not EXCEPT: d2's doc_id is unique (documents keyed by
    // doc_id, both stage joins are on unique keys), so the set semantics
    // are identical — EXCEPT additionally paid a distinct-aggregate over
    // both sides (one more exchange) to dedup rows that cannot repeat
    d2c.select("doc_id").join(losers, Seq("doc_id"), "left_anti")
      .orderBy("doc_id")
  }

  private val pipelineOracle = {
    import QueriesDedup.{bandKeysSql, shinglesSql, sigSql}
    val stop = TextOps.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |d1 AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
       |t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM d1),
       |d2 AS (SELECT doc_id, text, toks FROM t
       |       WHERE len(toks) >= $MinTokens
       |         AND CAST(len(list_filter(toks, x -> list_contains($stop, x))) AS DOUBLE)
       |             / len(toks) <= $MaxStopwordRatio),
       |s AS (SELECT doc_id, ${shinglesSql("toks")} AS sh FROM d2),
       |g AS (SELECT doc_id, sh, ${sigSql("sh")} AS sig FROM s),
       |bands AS (SELECT doc_id, unnest(${bandKeysSql("sig")}) AS key,
       |                 unnest(range(0, ${NearDup.Bands})) AS band FROM g),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |losers AS (SELECT DISTINCT id_b AS doc_id FROM cand
       |           JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
       |           WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |                 / len(list_distinct(list_concat(sa.sh, sb.sh))) >= $JaccardThreshold)
       |SELECT doc_id FROM d2
       |EXCEPT SELECT doc_id FROM losers
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_clean_corpus" -> (pipelineQuery _),
  )

  val oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" -> pipelineOracle,
  )
}
