package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.EventOps

/** General relational + event-analytics queries (SURVEY.md §2.7): the
  * engine's SQL surface beyond the reference's vector ops. Monetary sums go
  * through DECIMAL(18,4) so they are bit-exact regardless of partition /
  * summation order (doubles are not associative; decimals are).
  */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  private def dec(c: String) = col(c).cast("decimal(18,4)")

  // ---- TPC-H Q1-style pricing summary -------------------------------------

  private def q1(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2026-01-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec("l_quantity")).cast("double").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec("l_extendedprice") * (lit(1) - dec("l_discount"))
          * (lit(1) + dec("l_tax"))).cast("double").as("sum_charge"),
        (sum(dec("l_quantity")).cast("double") / count("*")).as("avg_qty"),
        (sum(dec("l_discount")).cast("double") / count("*")).as("avg_disc"),
        count("*").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2026-01-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- TPC-H Q3-style top revenue (3-way join, broadcast dims) ------------

  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(broadcast(ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey"))),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q3Oracle =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---- window: top-3 orders per customer ----------------------------------

  private def topOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  private val topOrdersOracle =
    """SELECT o_custkey, CAST(row_number() OVER
      |  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
      |  o_orderkey, o_totalprice
      |FROM orders QUALIFY rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // ---- events: sessionize + hourly rollup ----------------------------------

  private def sessionizeQuery(s: SparkSession, dir: String): DataFrame =
    EventOps.sessionize(Tables.events(s, dir))
      .orderBy("user_id", "session_start_ms")

  private val sessionizeOracle =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, value FROM events),
       |m AS (SELECT *, CASE WHEN ms - lag(ms) OVER w > ${EventOps.SessionGapMs}
       |                     OR lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
       |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM m)
       |SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms,
       |       count(*) AS n_events,
       |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
       |FROM s GROUP BY user_id, sess_id
       |ORDER BY user_id, session_start_ms""".stripMargin

  private def hourlyQuery(s: SparkSession, dir: String): DataFrame =
    EventOps.hourlyRollup(Tables.events(s, dir)).orderBy("hour_ms", "event_type")

  private val hourlyOracle =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- TPC-H Q14-style promo revenue (LIKE + conditional aggregation) -----

  private def q14(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .agg(
        (sum(when(col("p_type").startsWith("PROMO"),
          dec("l_extendedprice") * (lit(1) - dec("l_discount")))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") * 100.0 /
          sum(dec("l_extendedprice") * (lit(1) - dec("l_discount")))
            .cast("double")).as("promo_revenue_pct"),
        count("*").as("n_rows"))
      .select(round(col("promo_revenue_pct"), 6).as("promo_revenue_pct"),
        col("n_rows"))
  }

  private val q14Oracle =
    """SELECT round(
      |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
      |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE),
      |  6) AS promo_revenue_pct,
      |  count(*) AS n_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  // ---- JSON props extraction ----------------------------------------------

  /** Semi-structured surface: parse the events `props` JSON column and
    * aggregate the extracted field — the standard telemetry-payload shape. */
  private def jsonPropsQuery(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      // avg derived as sum/count (identical integer inputs → bit-identical
      // double on both engines); DuckDB sum(INT) is HUGEINT → cast BIGINT
      // in the oracle so the canonicalizer sees int64 on both sides.
      .agg(count("*").as("n"), sum("k").as("sum_k"),
        (sum("k").cast("double") / count("k")).as("avg_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  private val jsonPropsOracle =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  CAST(CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS DOUBLE)
      |    / count(CAST(json_extract_string(props, '$.k') AS INT)) AS avg_k,
      |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- rollup (multi-level aggregation) -----------------------------------

  private def rollupQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.select(col("event_type"),
        (floor(EventOps.tsMs(e) / 86400000L) * 86400000L).cast("long").as("day_ms"),
        col("value"))
      .rollup("event_type", "day_ms")
      .agg(count("*").as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day_ms"), lit(-1L)).as("day_ms"),
        col("n"), col("sum_value"))
      .orderBy("event_type", "day_ms")
  }

  private val rollupOracle =
    """SELECT coalesce(event_type, 'ALL') AS event_type,
      |  coalesce(epoch_ms(date_trunc('day', ts)), -1) AS day_ms,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY ROLLUP (event_type, epoch_ms(date_trunc('day', ts)))
      |ORDER BY event_type, day_ms""".stripMargin

  // ---- set op: BUILDING customers without a big-ticket order (EXCEPT) -----

  private def exceptQuery(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
      .except(t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("c_custkey")))
      .orderBy("c_custkey")

  private val exceptOracle =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000
      |ORDER BY c_custkey""".stripMargin

  // ---- as-of join: each purchase ↔ the user's latest prior click ----------

  private def asofQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val ms = EventOps.tsMs(e)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), ms.as("ms"))
    // right side unique per (user, ms): keep the largest event id
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), ms.as("ms"), col("event_id"))
      .groupBy("user_id", "ms")
      .agg(max("event_id").as("click_id"))
    EventOps.asOfJoin(purchases, clicks, "user_id", "ms")
      .filter(col("asof").isNotNull)
      .select(col("event_id"), col("user_id"), col("ms"),
        col("asof.click_id").as("prior_click_id"),
        (col("ms") - col("asof.ms")).as("gap_ms"))
      .orderBy("event_id")
  }

  private val asofOracle =
    """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS ms FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, epoch_ms(ts) AS ms, max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_ms(ts))
      |SELECT p.event_id, p.user_id, p.ms, c.click_id AS prior_click_id,
      |       p.ms - c.ms AS gap_ms
      |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ms >= c.ms
      |ORDER BY p.event_id""".stripMargin

  // ---- range join: each error event ↔ its containing session --------------

  private def rangeJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), EventOps.tsMs(e).as("ms"))
    val sessions = EventOps.sessionize(e)
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"))
    EventOps.rangeJoin(errors, sessions, "user_id", "ms",
      "session_start_ms", "session_end_ms")
      .select(col("event_id"), col("user_id"), col("session_start_ms"))
      .orderBy("event_id")
  }

  private val rangeJoinOracle =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events),
       |m AS (SELECT *, CASE WHEN ms - lag(ms) OVER w > ${EventOps.SessionGapMs}
       |                     OR lag(ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
       |sx AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM m),
       |sess AS (SELECT user_id, min(ms) AS session_start_ms, max(ms) AS session_end_ms
       |         FROM sx GROUP BY user_id, sess_id),
       |err AS (SELECT event_id, user_id, ms FROM e WHERE event_type = 'error')
       |SELECT err.event_id, err.user_id, sess.session_start_ms
       |FROM err JOIN sess ON err.user_id = sess.user_id
       |  AND err.ms BETWEEN sess.session_start_ms AND sess.session_end_ms
       |ORDER BY err.event_id""".stripMargin

  // ---- registry -----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1" -> (q1 _),
    "tpch_q3_top_revenue" -> (q3 _),
    "tpch_q14_promo" -> (q14 _),
    "window_top_orders" -> (topOrders _),
    "events_sessionize" -> (sessionizeQuery _),
    "events_hourly" -> (hourlyQuery _),
    "events_json_props" -> (jsonPropsQuery _),
    "events_asof_join" -> (asofQuery _),
    "events_range_join" -> (rangeJoinQuery _),
    "events_rollup" -> (rollupQuery _),
    "customers_except_bigorders" -> (exceptQuery _),
  )

  val oracles: Map[String, String] = Map(
    "tpch_q1" -> q1Oracle,
    "tpch_q3_top_revenue" -> q3Oracle,
    "tpch_q14_promo" -> q14Oracle,
    "window_top_orders" -> topOrdersOracle,
    "events_sessionize" -> sessionizeOracle,
    "events_hourly" -> hourlyOracle,
    "events_json_props" -> jsonPropsOracle,
    "events_asof_join" -> asofOracle,
    "events_range_join" -> rangeJoinOracle,
    "events_rollup" -> rollupOracle,
    "customers_except_bigorders" -> exceptOracle,
  )
}
