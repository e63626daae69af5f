package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's testdata tables (TESTDATA.md). */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** embeddings.parquet normalized to the engine's vector-table shape
    * (id: long, vec: array<float>, label) — SURVEY.md §1.1. */
  def vectors(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "documents")

  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")
}
