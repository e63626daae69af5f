package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, document fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) — they run inside the
  * parquet scan's whole-stage-codegen span and shuffle nothing.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  /** Stopword list used by quality scoring (fixed, engine-defined). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "on", "for")

  /** Per-document quality statistics: token count, distinct tokens, average
    * token length, stopword ratio, duplication ratio (1 - distinct/total).
    * The standard cheap quality filters for pretraining corpora. */
  def qualityStats(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = tokens(col(textCol))
    val n = size(t)
    val stop = array(Stopwords.map(lit): _*)
    docs.select(
      col(idCol),
      n.as("n_tokens"),
      size(array_distinct(t)).as("n_distinct"),
      (aggregate(transform(t, x => length(x)), lit(0), (a, x) => a + x)
        .cast("double") / n).as("avg_token_len"),
      (size(filter(t, x => array_contains(stop, x))).cast("double") / n)
        .as("stopword_ratio"),
      (lit(1.0) - size(array_distinct(t)).cast("double") / n).as("dup_ratio"))
  }

  /** Marker-token lists for the n-gram/stopword language-ID heuristic.
    * Priority on ties: en > de > es > fr (deterministic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "de", "que", "los", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"))

  /** Heuristic language ID: per-language marker-token counts + argmax with
    * fixed priority order; "und" (undetermined) when all scores are zero. */
  def langId(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val t = tokens(col(textCol))
    val scores = LangMarkers.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      lang -> size(filter(t, x => array_contains(m, x)))
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred = when(en + de + es + fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
    docs.select(col(idCol) +: scores.map { case (l, c) => c.as(s"score_$l") }
      :+ pred.as("pred_lang"): _*)
  }

  /** Deterministic document fingerprint: polynomial rolling hash over the
    * character stream, mod 1e9+7 — the classic Rabin-Karp document
    * fingerprint, expressible identically in any SQL engine. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31L + x) % 1000000007L)
}
