package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{QueriesAnn, QueriesDedup, QueriesGraph, QueriesMultimodal, QueriesPipeline, QueriesRelational, QueriesStreaming, QueriesText, QueriesVector}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an implemented operator from SURVEY.md §2
  * (or a training-data-pipeline extension); entries with a matching
  * [[oracleSql]] are hash-checked against DuckDB on the same parquet tables.
  * Query groups live under graft.queries.*.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact kNN join (SURVEY A1) over the embeddings table. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_l2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesVector.queries ++ QueriesText.queries ++
      QueriesRelational.queries ++ QueriesGraph.queries ++
      QueriesDedup.queries ++ QueriesAnn.queries ++
      QueriesStreaming.queries ++ QueriesMultimodal.queries ++
      QueriesPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueriesVector.oracles ++ QueriesText.oracles ++
      QueriesRelational.oracles ++ QueriesGraph.oracles ++
      QueriesDedup.oracles ++ QueriesAnn.oracles ++
      QueriesStreaming.oracles ++ QueriesMultimodal.oracles ++
      QueriesPipeline.oracles
}
