package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Window-function inventory, SURVEY.md §2 B5 + the batch twins of the
  * streaming windows (B10.1–B10.3: tumbling / sliding / session — `window()`
  * and `session_window()` are plain batch expressions too, so these get full
  * DuckDB-oracle coverage while the streaming variants live in
  * [[graft.stream.Streaming]] with batch-equivalence tests).
  *
  * Determinism: every window ORDER BY carries a unique tiebreaker key, and
  * window averages use the decimal-sum→double÷count pattern (see
  * [[Relational]]).
  */
object Windows {

  // Raw decimal sum — the canonical DOUBLE final cast (see [[Relational]]:
  // decimal output columns fail the driver's hash gate; decimal-sum→double
  // is the proven-green pattern) is applied AFTER `.over(w)` at each use
  // site, because a window spec must attach to the bare aggregate function,
  // not to a Cast around it.
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"))
        .withColumn("new_session",
          coalesce(col("gap_us") > 1800L * 1000000L, lit(true)))
        .orderBy("user_id", "ts", "event_id")
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          dsum(col("value")).over(w).cast("double").as("running_value"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy("user_id", "ts", "event_id")
    }),

    "win_sliding_avg" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(asc("ts"), asc("event_id"))
        .rowsBetween(-3, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          (dsum(col("value")).over(w).cast("double")
            / count(lit(1)).over(w)).as("moving_avg"))
        .orderBy("user_id", "event_id")
    }),

    "win_range_frame" -> ((s, d) => {
      // value-based frame: orders within $10k below each order's price,
      // same customer — frame content depends only on values, so ties in
      // o_totalprice are harmless.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"),
          dsum(col("o_totalprice")).over(w).cast("double").as("band_total"))
        .orderBy("o_orderkey")
    }),

    "win_ntile_pct" -> ((s, d) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(asc("s_acctbal"), asc("s_suppkey"))
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_nationkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("s_suppkey")
    }),

    // Frame-pinned value picks: first/last/nth over the FULL partition
    // frame. The default frame (unbounded-preceding → current-row) would
    // make last()/nth_value() row-dependent — a classic silent-wrong-answer;
    // the explicit unbounded frame is the semantics users actually mean.
    "win_first_last" -> ((s, d) => {
      val wFull = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(wFull).as("first_order"),
          last(col("o_orderkey")).over(wFull).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    }),

    // ------------------------------------------- batch twins of streaming
    "win_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).cast("double").as("total_value"))
        .select(col("window.start").as("bucket_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("bucket_start", "event_type")),

    "win_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).cast("double").as("total_value"))
        .select(col("window.start").as("bucket_start"), col("n"),
          col("total_value"))
        .orderBy("bucket_start")),

    "win_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).cast("double").as("session_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")),

    // Gap-filled time series with carry-forward (B5.11): the dense
    // hourly grid per event_type — missing buckets materialized with
    // n_events = 0 and the last seen hourly sum CARRIED FORWARD (locf,
    // the dashboard/feature-store staple Spark has no builtin for;
    // `last(_, ignoreNulls)` over an unbounded-preceding ROWS frame IS
    // the idiom). Grid = distinct types × sequence(h0, h1) — the bounds
    // ride a 1-row broadcast, the fan-out is grid-sized (types × hours:
    // tiny next to the events), and the only corpus-sized exchanges are
    // the hourly pre-aggregation and the type-keyed locf window (hours
    // per type is bounded — no skew). Sums are decimal internally,
    // DOUBLE at the edge (the house pattern), and locf carries the
    // decimal exactly before the one final cast.
    "ts_gapfill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val agg = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket_ts"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val grid = ev.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("bucket_ts"))
      val w = Window.partitionBy("event_type").orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("event_type", "bucket_ts"), "left_outer")
        .select(col("event_type"), col("bucket_ts"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          col("sv").cast("double").as("sum_value"),
          last(col("sv"), ignoreNulls = true).over(w)
            .cast("double").as("locf_sum"),
          col("n").isNull.as("gap"))
        .orderBy("event_type", "bucket_ts")
    }),

    // Cohort retention (B5.12): users grouped by first-active week, the
    // classic product-analytics matrix — n_active at each week offset
    // over cohort size. Two distinct-aggregations (first-touch per user,
    // active weeks per user) + one integer offset + one exactly-rounded
    // division; the week truncations are Monday-aligned in BOTH engines
    // and the offset is an exact day-difference ÷ 7 on aligned
    // timestamps. Scale: user-keyed exchanges with map-side partials;
    // the cohort-size table is week-cardinality and broadcasts back.
    "cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
        .distinct()
      val sizes = first.groupBy("cohort_week")
        .agg(countDistinct("user_id").as("cohort_size"))
      active.join(first, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (datediff(col("active_week"), col("cohort_week")) / 7)
            .cast("int").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(countDistinct("user_id").as("n_active"))
        .join(broadcast(sizes), "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size"))
            .as("retention"))
        .orderBy("cohort_week", "week_offset")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "win_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    row_number() OVER w AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "win_lag_lead" ->
      """SELECT user_id, event_id, ts, event_type,
        |  lag(event_type, 1) OVER w AS prev_type,
        |  lead(event_type, 1) OVER w AS next_type,
        |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
        |  COALESCE(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000, TRUE)
        |    AS new_session
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "win_running_sum" ->
      """SELECT user_id, event_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS running_value,
        |  COUNT(*) OVER w AS running_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,

    "win_sliding_avg" ->
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS moving_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "win_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  COUNT(*) OVER w AS n_in_band,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS band_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice ASC
        |  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "win_ntile_pct" ->
      """SELECT s_suppkey, s_nationkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
        |ORDER BY s_suppkey""".stripMargin,

    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_order,
        |  last_value(o_orderkey) OVER w AS last_order,
        |  nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "topk_per_group" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,

    "win_tumbling" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,

    // a 1h-window/15min-slide event lands in the 4 slide-aligned buckets
    // covering it — reproduce via a 0..3 offset fan-out
    "win_sliding" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
        |    AS bucket_start,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) k(k)
        |WHERE ts >= time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
        |  AND ts <  time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE
        |        + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY bucket_start""".stripMargin,

    // session_window(gap 30min) == gaps-and-islands with a 30min threshold.
    // NOTE '>=': Spark sessions are end-EXCLUSIVE (window end = ts + gap; an
    // event AT the end starts a new session), so a gap of exactly the
    // threshold splits — strict '>' would merge it in the oracle only.
    // event_id tiebreaks both window orders (total-order discipline).
    "win_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "ts_gapfill" ->
      """WITH agg AS (SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
        |    COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |    date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |grid AS (SELECT t.event_type, g.bucket_ts
        |  FROM (SELECT DISTINCT event_type FROM events) t, b,
        |    LATERAL (SELECT unnest(generate_series(b.h0, b.h1,
        |      INTERVAL 1 HOUR)) AS bucket_ts) g)
        |SELECT g.event_type, g.bucket_ts,
        |  COALESCE(a.n, 0) AS n_events,
        |  CAST(a.sv AS DOUBLE) AS sum_value,
        |  CAST(last_value(a.sv IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.bucket_ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS locf_sum,
        |  a.n IS NULL AS gap
        |FROM grid g LEFT JOIN agg a USING (event_type, bucket_ts)
        |ORDER BY g.event_type, g.bucket_ts""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
        |  FROM events),
        |j AS (SELECT a.user_id, f.cohort_week,
        |    CAST(date_diff('day', f.cohort_week, a.active_week) / 7
        |      AS INTEGER) AS week_offset
        |  FROM a JOIN f USING (user_id)),
        |s AS (SELECT cohort_week, COUNT(DISTINCT user_id) AS cohort_size
        |  FROM f GROUP BY 1)
        |SELECT j.cohort_week, j.week_offset,
        |  COUNT(DISTINCT j.user_id) AS n_active, s.cohort_size,
        |  CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size
        |    AS retention
        |FROM j JOIN s USING (cohort_week)
        |GROUP BY j.cohort_week, j.week_offset, s.cohort_size
        |ORDER BY j.cohort_week, j.week_offset""".stripMargin
  )
}
