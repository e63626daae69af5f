package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting for training-data pipelines: every
  * assignment is a pure function of the row id (Knuth multiplicative
  * hash), so splits are reproducible across runs, engines, and cluster
  * sizes — no RNG state, no partition-order dependence, and rows keep
  * their assignment when the corpus is re-processed incrementally.
  * Single-pass column expressions; nothing shuffles for the assignment
  * itself. */
object Sampling {

  /** Knuth multiplicative hash of an integer id into [0, buckets).
    * 2654435761 = floor(2^32 / phi); the `& 0x7fffffff` keeps the value
    * positive in engines without unsigned ints. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod((id * lit(2654435761L)).bitwiseAND(lit(0x7fffffffL)), lit(buckets))

  /** Train/val/test assignment by percentage (must sum to 100). */
  def split(df: DataFrame, idCol: String = "doc_id",
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "test split must be non-empty")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Keep a deterministic `pct`% sample within every stratum (e.g. per
    * language or per label) — the standard balanced-downsampling step. */
  def stratifiedSample(df: DataFrame, pct: Int,
                       idCol: String = "doc_id"): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)
}
