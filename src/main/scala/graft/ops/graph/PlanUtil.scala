package graft.ops.graph

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Lineage cutting for iterative dataflow.
  *
  * `Dataset.localCheckpoint()` (Spark 4) truncates the plan to a
  * LogicalRDD but PRESERVES the child plan's `sizeInBytes` statistic.
  * Iterative algorithms whose per-round plan multiplies child sizes
  * (joins, cogroups — SizeInBytesOnlyStatsPlanVisitor takes the product)
  * therefore grow the carried BigInt exponentially: by round 16 of a BSP
  * loop the statistic has ~2.5 MILLION digits and every subsequent
  * optimizer pass (e.g. InjectRuntimeFilter's canBroadcastBySize) burns
  * minutes in Toom-Cook BigInt multiplication — the job looks hung while
  * the driver multiplies million-digit integers.
  *
  * [[cut]]/[[cutDF]] re-wrap the checkpointed RDD in a fresh Dataset, so
  * the plan root is an ExternalRDD/LogicalRDD with DEFAULT statistics —
  * constant-size stats per round, planning cost O(1) in round count. The
  * price is one encode/decode pass per round boundary, negligible next to
  * the round's shuffles.
  */
private[graft] object PlanUtil {

  /** Local checkpoint blocks die with their executor — acceptable on the
    * single-JVM driver contract, but a lost block is unrecomputable. When
    * the session has a RELIABLE checkpoint dir configured
    * (`sc.setCheckpointDir`, the standard Spark knob), use reliable
    * checkpointing instead so materialized stages survive executor loss. */
  private def checkpointed[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint()
    else ds.localCheckpoint()

  /** Materialize (eager checkpoint) + cut lineage AND statistics. */
  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val cp = checkpointed(ds)
    cp.sparkSession.createDataset(cp.rdd)(ds.encoder)
  }

  /** DataFrame variant (Row encoder via createDataFrame). */
  def cutDF(df: DataFrame): DataFrame = {
    val cp = checkpointed(df)
    cp.sparkSession.createDataFrame(cp.rdd, df.schema)
  }
}
