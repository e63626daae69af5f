package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics over the `events` table: sessionization and
  * time-bucketed rollups. The streaming (Structured Streaming) counterparts
  * live in graft.streaming; these batch forms are the oracle-checkable ones.
  *
  * All timestamp arithmetic is done on epoch milliseconds (longs) so results
  * are engine-portable: the parquet files store nanosecond timestamps, which
  * Spark truncates to micros on read — working in ms floors identically in
  * every engine.
  */
object EventOps {

  val SessionGapMs: Long = 30L * 60 * 1000 // 30 minutes

  /** Epoch-millis from the events `ts` column, robust to every physical
    * type the generator has produced: TIMESTAMP(NANOS) read as raw nanos
    * longs under spark.sql.legacy.parquet.nanosAsLong=true, tz-naive
    * TIMESTAMP(MICROS) (Spark 4 infers TIMESTAMP_NTZ, which unix_millis
    * rejects), and a genuine tz'd timestamp. The NTZ→TIMESTAMP cast
    * interprets the wall-clock in the session timezone — every session
    * here pins spark.sql.session.timeZone=UTC, matching DuckDB's
    * epoch_ms on naive timestamps (also UTC). */
  def tsMs(df: DataFrame): Column =
    df.schema("ts").dataType match {
      // integer division: nanos exceed double's 2^53 mantissa, so `/` (which
      // is double division) would corrupt the low bits
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => unix_millis(col("ts"))
    }

  /** Gap-based sessionization: a new session starts when the user's
    * inter-event gap exceeds `gapMs`. One output row per session:
    * (user_id, session_start_ms, session_end_ms, n_events, sum_value).
    * sum_value goes through DECIMAL so it is order-independent-exact. */
  def sessionize(events: DataFrame, gapMs: Long = SessionGapMs): DataFrame = {
    val e = events.select(col("user_id"), tsMs(events).as("ms"),
      col("event_id"), col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val withSess = e
      .withColumn("new_sess",
        when(col("ms") - lag(col("ms"), 1).over(w) > gapMs, 1)
          .when(lag(col("ms"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSess.groupBy("user_id", "sess_id")
      .agg(
        min(col("ms")).as("session_start_ms"),
        max(col("ms")).as("session_end_ms"),
        count("*").as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .drop("sess_id")
  }

  /** As-of join: for every left row, the single right row with the same
    * key and the greatest time ≤ the left time — the standard time-series
    * enrichment operator (market-data "last quote before trade" shape)
    * that Spark lacks natively.
    *
    * Implemented as union + running `last(ignoreNulls)` window rather than
    * a range join: ONE shuffle keyed by `keyCol`, no time-range cross
    * product, O(n log n) per key — survives arbitrarily long histories.
    * Right rows order before left rows at equal times (ties included,
    * like DuckDB/kdb ASOF semantics). Right side must be unique per
    * (key, time) — pre-aggregate it if not.
    *
    * @param left   [keyCol, timeCol, ...left payload]
    * @param right  [keyCol, timeCol, ...right payload]
    * @return left columns + matched right payload struct (`asof` — null
    *         when no prior right row exists)
    */
  def asOfJoin(left: DataFrame, right: DataFrame,
               keyCol: String, timeCol: String): DataFrame = {
    val rightPayload = struct(right.columns.map(col): _*)
    val l = left.withColumn("_tag", lit(1)).withColumn("_r",
      lit(null).cast(org.apache.spark.sql.types.StructType(
        right.schema.fields)))
    val r = right.select(
      col(keyCol), col(timeCol),
      lit(0).as("_tag"), rightPayload.as("_r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_r")
  }

  /** Range (interval-containment) join: left rows matched to right rows of
    * the same key whose [loCol, hiCol] interval contains the left time.
    * With an equi-key this is a plain keyed shuffle join + range filter —
    * no cross product (parallelism follows key cardinality; AQE splits
    * skewed keys). For KEYLESS range joins, bucket both sides by
    * fixed-width time blocks first (each interval lands in every block it
    * overlaps) and use the block id as the equi-key — same join shape. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
                timeCol: String, loCol: String, hiCol: String): DataFrame =
    left.join(right, Seq(keyCol))
      .filter(col(timeCol) >= col(loCol) && col(timeCol) <= col(hiCol))

  /** Hourly rollup per event type: (hour_ms, event_type, n, sum_value). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy((floor(tsMs(events) / 3600000L) * 3600000L).cast("long").as("hour_ms"),
        col("event_type"))
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
}
