package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Metric, Tables}
import graft.ops.KnnJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator from SURVEY.md §2;
  * entries with a matching [[oracleSql]] are hash-checked against DuckDB on
  * the same parquet tables at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact kNN join (SURVEY A1) over the embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_l2")(spark, "/root/testdata/sf0.001")

  // -- shared query fragments -------------------------------------------

  /** Split embeddings into queries (id < nQ) and base (id >= nQ). */
  private def knnQuery(metric: Metric)(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.vectors(s, dir)
    val q = emb.filter(col("id") < 20)
    val b = emb.filter(col("id") >= 20)
    KnnJoin.explodeRanks(KnnJoin(q, b, 10, metric))
      .select(col("query_id"), col("rank"), col("base_id"))
      .orderBy(col("query_id"), col("rank"))
  }

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
  private val cosSqlDist =
    s"""($ipSqlDist) / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * sqrt(list_sum(list_transform(be, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""

  // -- driver contract ---------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_l2" -> knnQuery(Metric.L2) _,
    "knn_ip" -> knnQuery(Metric.InnerProduct) _,
    "knn_cosine" -> knnQuery(Metric.Cosine) _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_l2" -> knnOracle(l2SqlDist),
    "knn_ip" -> knnOracle(ipSqlDist),
    "knn_cosine" -> knnOracle(cosSqlDist),
  )
}
