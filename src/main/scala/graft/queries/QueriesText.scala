package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Dedup, TextOps}

/** Text-analysis + dedup queries over the documents table, with DuckDB
  * oracles. All are single-pass column expressions or one hash shuffle. */
object QueriesText {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  // ---- quality stats ------------------------------------------------------

  private def qualityQuery(s: SparkSession, dir: String): DataFrame =
    TextOps.qualityStats(docs(s, dir))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("avg_token_len"), 6).as("avg_token_len"),
        round(col("stopword_ratio"), 6).as("stopword_ratio"),
        round(col("dup_ratio"), 6).as("dup_ratio"))
      .orderBy("doc_id")

  private val stopList =
    TextOps.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  private val qualityOracle =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 6) AS avg_token_len,
       |  round(CAST(len(list_filter(toks, x -> list_contains($stopList, x))) AS DOUBLE) / len(toks), 6) AS stopword_ratio,
       |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS dup_ratio
       |FROM t ORDER BY doc_id""".stripMargin

  // ---- language id --------------------------------------------------------

  private def langIdQuery(s: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(s, dir)).orderBy("doc_id")

  private val langIdOracle = {
    val markers = TextOps.LangMarkers.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val scoreCols = markers.map { case (l, lst) =>
      s"CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS INT) AS score_$l"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |sc AS (SELECT doc_id,
       |  $scoreCols
       |FROM t)
       |SELECT doc_id, score_en, score_de, score_es, score_fr,
       |  CASE WHEN score_en + score_de + score_es + score_fr = 0 THEN 'und'
       |       WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
       |       WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
       |       WHEN score_es >= score_fr THEN 'es'
       |       ELSE 'fr' END AS pred_lang
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  // ---- fingerprint --------------------------------------------------------

  private def fingerprintQuery(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  private val fingerprintOracle =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- token counting (whitespace + BPE-ish regex) -----------------------

  /** Word-or-punctuation-run tokenization — the cheap BPE-pretokenizer-
    * style count used for corpus budgeting. Same RE2-compatible pattern on
    * both engines. */
  private def tokenCountQuery(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]+', 0)"))
        .as("n_re_tokens"),
      length(col("text")).as("n_chars"))
      .orderBy("doc_id")

  private val tokenCountOracle =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS INT) AS n_re_tokens,
      |  CAST(length(text) AS INT) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- exact dedup --------------------------------------------------------

  private def dedupQuery(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir)).orderBy("text_hash")

  private val dedupOracle =
    """SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_id
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  // ---- n-gram Jaccard on a deterministic pair set ------------------------

  /** Standalone exact n-gram Jaccard (the verification kernel of the LSH
    * pipeline) over consecutive-id pairs — the direct operator surface. */
  private def ngramJaccardQuery(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.NearDup
    val sh = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("_toks"))
      .select(col("doc_id"),
        NearDup.shingleHashesFromTokens(col("_toks")).as("shingles"))
    val pairs = sh.select(col("doc_id").as("id_a"))
      .join(sh.select((col("doc_id") - 1).as("id_a")), "id_a")
      .select(col("id_a"), (col("id_a") + 1).as("id_b"))
    NearDup.jaccardOnPairs(pairs, sh, 0.0)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a")
  }

  private def ngramJaccardOracle: String = {
    val sh = QueriesDedup.shinglesSql("toks")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |s AS (SELECT doc_id, $sh AS sh FROM t),
       |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
       |      FROM s a JOIN s b ON b.doc_id = a.doc_id + 1)
       |SELECT id_a, id_b,
       |  round(CAST(len(list_intersect(sa, sb)) AS DOUBLE)
       |        / len(list_distinct(list_concat(sa, sb))), 6) AS jaccard
       |FROM p ORDER BY id_a""".stripMargin
  }

  // ---- language-ID accuracy vs the ground-truth lang column --------------

  private def langAccuracyQuery(s: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(s, dir))
      .join(docs(s, dir).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "pred_lang")
      .agg(count("*").as("n"))
      .orderBy("lang", "pred_lang")

  private val langAccuracyOracle = {
    val markers = TextOps.LangMarkers.map { case (l, ws) =>
      l -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
    }
    val scoreCols = markers.map { case (l, lst) =>
      s"CAST(len(list_filter(toks, x -> list_contains($lst, x))) AS INT) AS score_$l"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |sc AS (SELECT doc_id, lang, $scoreCols FROM t),
       |p AS (SELECT lang,
       |  CASE WHEN score_en + score_de + score_es + score_fr = 0 THEN 'und'
       |       WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
       |       WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
       |       WHEN score_es >= score_fr THEN 'es'
       |       ELSE 'fr' END AS pred_lang
       |FROM sc)
       |SELECT lang, pred_lang, count(*) AS n FROM p
       |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  }

  // ---- vocabulary stats (term + document frequency) ----------------------

  private def vocabQuery(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    toks.groupBy("tok")
      .agg(count("*").as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(20)
  }

  private val vocabOracle =
    """SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok ORDER BY tf DESC, tok LIMIT 20""".stripMargin

  // ---- deterministic split + stratified sample ---------------------------

  private def splitQuery(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.split(docs(s, dir))
      .groupBy("split", "lang")
      .agg(count("*").as("n"), sum(length(col("text"))).as("total_chars"))
      .orderBy("split", "lang")

  private val hashBucketSql =
    "((doc_id * 2654435761) & 2147483647) % 100"

  private val splitOracle =
    s"""SELECT CASE WHEN $hashBucketSql < 80 THEN 'train'
       |            WHEN $hashBucketSql < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |       lang, count(*) AS n,
       |       CAST(sum(length(text)) AS BIGINT) AS total_chars
       |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  private def stratifiedQuery(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratifiedSample(docs(s, dir), 25)
      .groupBy("lang")
      .agg(count("*").as("n_sampled"), min("doc_id").as("first_id"))
      .orderBy("lang")

  private val stratifiedOracle =
    s"""SELECT lang, count(*) AS n_sampled, min(doc_id) AS first_id
       |FROM documents WHERE $hashBucketSql < 25
       |GROUP BY lang ORDER BY lang""".stripMargin

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> (qualityQuery _),
    "text_lang_id" -> (langIdQuery _),
    "text_fingerprint" -> (fingerprintQuery _),
    "text_token_count" -> (tokenCountQuery _),
    "text_ngram_jaccard" -> (ngramJaccardQuery _),
    "text_lang_accuracy" -> (langAccuracyQuery _),
    "text_vocab_top" -> (vocabQuery _),
    "sample_split" -> (splitQuery _),
    "sample_stratified" -> (stratifiedQuery _),
    "dedup_exact" -> (dedupQuery _),
  )

  val oracles: Map[String, String] = Map(
    "text_quality" -> qualityOracle,
    "text_lang_id" -> langIdOracle,
    "text_fingerprint" -> fingerprintOracle,
    "text_token_count" -> tokenCountOracle,
    "text_ngram_jaccard" -> ngramJaccardOracle,
    "text_lang_accuracy" -> langAccuracyOracle,
    "text_vocab_top" -> vocabOracle,
    "sample_split" -> splitOracle,
    "sample_stratified" -> stratifiedOracle,
    "dedup_exact" -> dedupOracle,
  )
}
