package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Det._

/** The reference's medallion pipeline shapes (SURVEY §2 / §7.1), re-expressed
  * over the driver's `events` + `customer` tables so the DuckDB oracle gate
  * verifies the exact operator semantics the IoT models use on the seed
  * fixture: staging projection (P1/F1-F3), enrichment join + anomaly CASE
  * (J1/F11), hourly health rollup (A1), daily summary with composite-key
  * left join + health score (A2/A3/J3/F13-F15), and an SCD dimension with
  * surrogate keys (A4/J4/F16).
  *
  * `user_id` plays device_id, `event_type` plays metric_name, `value` plays
  * metric_value, `error` events play anomalies, `purchase` events play
  * alerts.
  */
object EventsPipeline {

  private def t(s: SparkSession, dir: String, n: String) = Catalog.table(s, dir, n)

  /** md5 surrogate key over string-rendered parts (F16, dbt_utils
    * semantics) — only int/string/date/formatted-ts parts, never raw
    * doubles (engine double→string rendering differs).
    */
  private def skey(cols: org.apache.spark.sql.Column*) =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"),
      lit("_dbt_utils_surrogate_key_null_"))): _*))

  /** Staging projection with JSON prop extraction and audit literal
    * (stg_* analog; F1/F2/F18 + semi-structured access).
    */
  val q20 = Q("q20_stg_events",
    """SELECT event_id, user_id,
      |  lower(trim(event_type)) AS event_type,
      |  value AS metric_value,
      |  ts AS event_ts,
      |  props ->> '$.k' AS prop_k,
      |  'graft-run' AS _invocation_id
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      lower(trim(col("event_type"))).as("event_type"),
      col("value").as("metric_value"),
      col("ts").as("event_ts"),
      get_json_object(col("props"), "$.k").as("prop_k"),
      lit("graft-run").as("_invocation_id"))
      .orderBy("event_id")
  }

  /** Enrichment left join + threshold anomaly flags (int_*_cleaned analog:
    * J1 + F11 null-guarded CASE).
    */
  val q21 = Q("q21_events_enriched",
    """SELECT event_id, e.user_id, event_type, value, ts,
      |  c_name AS user_name, c_mktsegment AS segment,
      |  (value IS NULL) AS is_missing_value,
      |  CASE
      |    WHEN event_type = 'error' AND value IS NOT NULL AND value > 90.0 THEN TRUE
      |    WHEN event_type = 'purchase' AND value IS NOT NULL AND (value > 95.0 OR value < 1.0) THEN TRUE
      |    ELSE FALSE
      |  END AS is_anomaly
      |FROM events e LEFT JOIN customer ON e.user_id = c_custkey
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
    val c = t(s, dir, "customer")
    val v = col("value")
    e.join(c, e("user_id") === c("c_custkey"), "left")
      .select(
        col("event_id"), e("user_id"), col("event_type"), col("value"), col("ts"),
        col("c_name").as("user_name"), col("c_mktsegment").as("segment"),
        v.isNull.as("is_missing_value"),
        when(col("event_type") === "error" && v.isNotNull && v > 90.0, true)
          .when(col("event_type") === "purchase" && v.isNotNull && (v > 95.0 || v < 1.0), true)
          .otherwise(false).as("is_anomaly"))
      .orderBy("event_id")
  }

  /** Hourly health rollup (int_device_health analog: A1 full stat set with
    * deterministic stddev, anomaly rate, surrogate key over an expression
    * component).
    */
  val q22 = Q("q22_hourly_health",
    """SELECT
      |  md5(concat_ws('-', event_type, CAST(date_trunc('hour', ts) AS VARCHAR))) AS health_key,
      |  event_type,
      |  date_trunc('hour', ts) AS event_hour,
      |  COUNT(*) AS event_count,
      |  SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) / 10000.0 / COUNT(value) AS avg_value,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value,
      |  CASE WHEN COUNT(value) > 1 THEN
      |    SQRT((SUM(CAST(FLOOR(value * value * 1000000.0) AS BIGINT)) / 1000000.0
      |      - (SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) / 1000000.0)
      |        * (SUM(CAST(FLOOR(value * 1000000.0) AS BIGINT)) / 1000000.0) / COUNT(value))
      |      / (COUNT(value) - 1.0))
      |  END AS stddev_value,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
      |  FLOOR(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100.0
      |    / COUNT(*) * 10.0 + 0.5) / 10.0 AS error_rate_pct,
      |  MAX(ts) AS latest_ts
      |FROM events
      |GROUP BY event_type, date_trunc('hour', ts)
      |ORDER BY event_type, event_hour""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("event_hour"))
      .agg(
        count(lit(1)).as("event_count"),
        davg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        dstddev(col("value")).as("stddev_value"),
        countIf(col("event_type") === "error").as("error_count"),
        dround(countIf(col("event_type") === "error") * 100.0 / count(lit(1)), 1)
          .as("error_rate_pct"),
        max(col("ts")).as("latest_ts"))
      .select(
        skey(col("event_type"), col("event_hour")).as("health_key"),
        col("*"))
      .orderBy("event_type", "event_hour")
  }

  /** Daily user scorecard (fct_device_summary analog): daily event stats ⟕
    * daily purchase rollup on the composite (user_id, day) key, health
    * score with coalesce/nullif/greatest, category CASE.
    */
  val q23 = Q("q23_daily_user_summary",
    """WITH daily_events AS (
      |  SELECT user_id, CAST(ts AS DATE) AS event_date,
      |    COUNT(*) AS total_events,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
      |    SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) / 10000.0 AS total_value,
      |    FLOOR(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 100.0
      |      / COUNT(*) * 10.0 + 0.5) / 10.0 AS error_rate_pct,
      |    MIN(ts) AS first_event_ts,
      |    MAX(ts) AS last_event_ts
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)
      |), daily_purchases AS (
      |  SELECT user_id, CAST(ts AS DATE) AS purchase_date,
      |    COUNT(*) AS total_purchases,
      |    SUM(CAST(FLOOR(value * 10000.0) AS BIGINT)) / 10000.0 AS purchase_value
      |  FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id, CAST(ts AS DATE)
      |)
      |SELECT
      |  md5(concat_ws('-', CAST(e.user_id AS VARCHAR), CAST(e.event_date AS VARCHAR))) AS summary_key,
      |  e.user_id, e.event_date, e.total_events, e.error_events, e.total_value,
      |  e.error_rate_pct, e.first_event_ts, e.last_event_ts,
      |  COALESCE(p.total_purchases, 0) AS total_purchases,
      |  COALESCE(p.purchase_value, 0.0) AS purchase_value,
      |  GREATEST(0.0, 100.0 - e.error_events * 5.0 - e.error_rate_pct * 0.5) AS engagement_score,
      |  CASE
      |    WHEN e.error_events > 3 THEN 'critical'
      |    WHEN e.error_events > 0 THEN 'at_risk'
      |    WHEN COALESCE(p.total_purchases, 0) = 0 THEN 'inactive'
      |    ELSE 'healthy'
      |  END AS engagement_category
      |FROM daily_events e
      |LEFT JOIN daily_purchases p
      |  ON e.user_id = p.user_id AND e.event_date = p.purchase_date
      |ORDER BY e.user_id, e.event_date""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val dailyEvents = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("event_date"))
      .agg(
        count(lit(1)).as("total_events"),
        countIf(col("event_type") === "error").as("error_events"),
        dsum(col("value")).as("total_value"),
        dround(countIf(col("event_type") === "error") * 100.0 / count(lit(1)), 1)
          .as("error_rate_pct"),
        min(col("ts")).as("first_event_ts"),
        max(col("ts")).as("last_event_ts"))
    val dailyPurchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user_id"), to_date(col("ts")).as("purchase_date"))
      .agg(
        count(lit(1)).as("p_total_purchases"),
        dsum(col("value")).as("p_purchase_value"))
    dailyEvents
      .join(dailyPurchases,
        dailyEvents("user_id") === dailyPurchases("p_user_id") &&
          dailyEvents("event_date") === dailyPurchases("purchase_date"),
        "left")
      .select(
        skey(col("user_id"), col("event_date")).as("summary_key"),
        col("user_id"), col("event_date"), col("total_events"), col("error_events"),
        col("total_value"), col("error_rate_pct"), col("first_event_ts"), col("last_event_ts"),
        coalesce(col("p_total_purchases"), lit(0L)).as("total_purchases"),
        coalesce(col("p_purchase_value"), lit(0.0)).as("purchase_value"),
        greatest(lit(0.0), lit(100.0) - col("error_events") * 5.0 - col("error_rate_pct") * 0.5)
          .as("engagement_score"),
        when(col("error_events") > 3, "critical")
          .when(col("error_events") > 0, "at_risk")
          .when(coalesce(col("p_total_purchases"), lit(0L)) === 0, "inactive")
          .otherwise("healthy").as("engagement_category"))
      .orderBy("user_id", "event_date")
  }

  /** SCD Type 1 user dimension (dim_devices analog: A4 lifetime stats +
    * J4 + F16 key + frozen SCD metadata F3).
    */
  val q24 = Q("q24_user_dim",
    """SELECT
      |  md5(concat_ws('-', CAST(c_custkey AS VARCHAR))) AS user_key,
      |  c_custkey AS user_id, c_name, c_mktsegment, c_acctbal, c_nationkey,
      |  COALESCE(s.total_events, 0) AS lifetime_events,
      |  CAST(COALESCE(s.error_events, 0) AS BIGINT) AS lifetime_errors,
      |  s.first_ts, s.last_ts,
      |  CASE WHEN s.total_events > 0
      |    THEN FLOOR(s.error_events * 100.0 / s.total_events * 100.0 + 0.5) / 100.0
      |    ELSE 0.0 END AS lifetime_error_rate_pct,
      |  TIMESTAMP '2025-02-01 00:00:00' AS _valid_from,
      |  CAST(NULL AS TIMESTAMP) AS _valid_to,
      |  TRUE AS _is_current
      |FROM customer
      |LEFT JOIN (
      |  SELECT user_id, COUNT(*) AS total_events,
      |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error_events,
      |    MIN(ts) AS first_ts, MAX(ts) AS last_ts
      |  FROM events GROUP BY user_id
      |) s ON c_custkey = s.user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val stats = t(s, dir, "events")
      .groupBy(col("user_id").as("s_user_id"))
      .agg(
        count(lit(1)).as("total_events"),
        countIf(col("event_type") === "error").as("error_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
    val c = t(s, dir, "customer")
    c.join(stats, c("c_custkey") === stats("s_user_id"), "left")
      .select(
        skey(col("c_custkey")).as("user_key"),
        col("c_custkey").as("user_id"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"), col("c_nationkey"),
        coalesce(col("total_events"), lit(0L)).as("lifetime_events"),
        coalesce(col("error_events"), lit(0L)).as("lifetime_errors"),
        col("first_ts"), col("last_ts"),
        when(col("total_events") > 0,
          dround(col("error_events") * 100.0 / col("total_events"), 2))
          .otherwise(0.0).as("lifetime_error_rate_pct"),
        lit(java.sql.Timestamp.valueOf("2025-02-01 00:00:00")).as("_valid_from"),
        lit(null).cast("timestamp").as("_valid_to"),
        lit(true).as("_is_current"))
      .orderBy("user_id")
  }

  /** Data-quality checks as scalar counts (SURVEY §2.10 not_null/unique/
    * accepted_values/relationships compiled shapes over the driver tables;
    * one row so the oracle compare is direct).
    */
  val q40 = Q("q40_dq_summary",
    """SELECT
      |  (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
      |     GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS dup_order_keys,
      |  (SELECT COUNT(*) FROM lineitem WHERE NOT EXISTS
      |     (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS orphan_lineitems,
      |  (SELECT COUNT(*) FROM events WHERE event_type IS NOT NULL AND event_type NOT IN
      |     ('click','view','purchase','signup','error')) AS bad_event_types,
      |  (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL) AS null_order_status
      |""".stripMargin) { (s, dir) =>
    val orders = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val ev = t(s, dir, "events")
    // Each base table is scanned exactly ONCE: the three orders-side
    // checks (unique key, null status, referential parent set) all fall
    // out of a single groupBy(o_orderkey) pass, and the orphan check is a
    // full-outer reconciliation against a per-key lineitem rollup rather
    // than a second anti-join scan of orders. One job, two co-partitioned
    // shuffles, one final aggregate.
    val ordersByKey = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("o_n"),
        sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)).as("o_null_status"))
    val liByKey = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("l_n"))
    ordersByKey
      .join(liByKey, col("o_orderkey") === col("l_orderkey"), "full_outer")
      .agg(
        count_if(col("o_orderkey").isNotNull && col("o_n") > 1).as("dup_order_keys"),
        sum(when(col("o_orderkey").isNull, col("l_n")).otherwise(0L)).as("orphan_lineitems"),
        sum(coalesce(col("o_null_status"), lit(0L))).as("null_order_status"))
      .crossJoin(graft.quality.Checks.acceptedValues(ev, "event_type",
        Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)).as("bad_event_types")))
      .select(col("dup_order_keys"), col("orphan_lineitems"),
        col("bad_event_types"), col("null_order_status"))
  }

  /** q60 — source freshness as data (SURVEY §2.10's last shape; reference
    * models/staging/sources.yml:7-10,44-47 declares warn_after 24h /
    * error_after 48h on the loaded-at field): per source, max(loaded_at),
    * whole-hours age against an injected deterministic `now`, and the
    * fresh/warn/error classification. Four source rows exercise all three
    * statuses (events→warn at 24/48 but fresh under a relaxed 48/168 SLA;
    * the 2001-dated TPC-H tables→error).
    */
  private val freshnessNow = java.sql.Timestamp.valueOf("2024-02-01 12:00:00")

  private def freshnessOracle(table: String, field: String, name: String,
      warnH: Long, errH: Long): String = {
    val nowS = s"FLOOR(epoch(TIMESTAMP '2024-02-01 12:00:00'))"
    val age = s"$nowS - FLOOR(epoch(max($field)))"
    s"""SELECT '$name' AS source_name, max($field) AS max_loaded_at,
       |  CAST(FLOOR(($age) / 3600.0) AS BIGINT) AS age_hours,
       |  CASE WHEN max($field) IS NULL OR $age > ${errH * 3600} THEN 'error'
       |       WHEN $age > ${warnH * 3600} THEN 'warn'
       |       ELSE 'fresh' END AS status
       |FROM $table""".stripMargin
  }

  val q60 = Q("q60_source_freshness",
    Seq(
      freshnessOracle("events", "ts", "events", 24, 48),
      freshnessOracle("events", "ts", "events_slow_sla", 48, 168),
      freshnessOracle("lineitem", "l_shipdate", "lineitem", 24, 48),
      freshnessOracle("orders", "o_orderdate", "orders", 24, 48))
      .mkString("", "\nUNION ALL\n", "\nORDER BY source_name")) { (s, dir) =>
    import graft.quality.Checks.freshnessSummary
    val ev = t(s, dir, "events")
    freshnessSummary(ev, "ts", "events", freshnessNow)
      .unionByName(freshnessSummary(ev, "ts", "events_slow_sla", freshnessNow, 48, 168))
      .unionByName(freshnessSummary(t(s, dir, "lineitem"), "l_shipdate", "lineitem", freshnessNow))
      .unionByName(freshnessSummary(t(s, dir, "orders"), "o_orderdate", "orders", freshnessNow))
      .orderBy("source_name")
  }

  /** q25 — gap-based sessionization (30-min inactivity): lag marks session
    * starts, a running sum numbers them, one aggregate per session. The
    * standard event-log shape for training-data pipelines; lag/lead and
    * running-frame windows are beyond the reference's W1-only surface.
    * Scale: one shuffle on user_id, sort within partitions — the same
    * shape Structured Streaming's session_window materializes.
    */
  val q25 = Q("q25_sessionize",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, event_id,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM marked
      |)
      |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(FLOOR(epoch(MAX(ts))) - FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_s
      |FROM numbered
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lagTs = lag(col("ts"), 1).over(w)
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_new",
        when(lagTs.isNull || col("ts") > lagTs + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_idx")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_s"))
      .drop("session_idx")
      .orderBy("user_id", "session_start")
  }

  /** q80 — peak concurrent sessions per day, the classic interval sweep:
    * sessions (q25's gap logic) become +1/−1 boundary deltas, the running
    * sum over boundary order is the live concurrency, and the max per day
    * is the capacity-planning number. Boundaries come from ONE lag+lead
    * window pass over the events — an event is a session START when the
    * gap before it exceeds the timeout (or it is first) and a session END
    * when the gap after it does (or it is last) — so the event table is
    * scanned and window-sorted exactly once; no session aggregate, and no
    * union of two copies of the sessionize subtree (the previous shape,
    * which evaluated the window twice). The order key encodes
    * starts-before-ends at equal timestamps (k = µs·2 + 0/1), same-key
    * deltas are PRE-AGGREGATED (k parity ⇒ same sign, so merging cannot
    * hide a peak) which also makes keys unique, and the running sum is
    * `exec/PrefixSum` — two parallel passes, NO single-partition global
    * window (the naive sweep's scale killer). The running sum is an
    * inlined value-bucketed prefix sum — the bucket is the HOUR INDEX
    * `k div 7.2e9`, derivable from the key itself, so unlike the generic
    * `exec/PrefixSum` there is no min/max bounds job: one job materializes
    * the boundary set, one tiny job collects per-hour delta totals
    * (bounded by corpus hours, not rows) into broadcast offsets, and one
    * job runs the hour-partitioned window plus the daily max. Same-key
    * deltas share a sign (k parity), so their intra-window order cannot
    * move a day's max — the sweep stays exact without pre-merging keys.
    */
  val q80 = Q("q80_session_concurrency",
    """WITH marked AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |      OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM marked
      |), sess AS (
      |  SELECT MIN(ts) AS s, MAX(ts) AS e FROM numbered GROUP BY user_id, session_idx
      |), pts AS (
      |  SELECT s AS ts, CAST(1 AS BIGINT) AS d, epoch_us(s) * 2 AS k FROM sess
      |  UNION ALL
      |  SELECT e, CAST(-1 AS BIGINT), epoch_us(e) * 2 + 1 FROM sess
      |), merged AS (
      |  SELECT k, CAST(SUM(d) AS BIGINT) AS d, MIN(ts) AS ts FROM pts GROUP BY k
      |), run AS (
      |  SELECT ts, SUM(d) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM merged
      |)
      |SELECT CAST(ts AS DATE) AS day, CAST(MAX(conc) AS BIGINT) AS peak_concurrency
      |FROM run
      |GROUP BY 1
      |ORDER BY day""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gap = expr("INTERVAL 30 MINUTES")
    val lagTs = lag(col("ts"), 1).over(w)
    val leadTs = lead(col("ts"), 1).over(w)
    val marked = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("is_start", lagTs.isNull || col("ts") > lagTs + gap)
      .withColumn("is_end", leadTs.isNull || leadTs > col("ts") + gap)
    // each boundary event emits its ±1 delta(s); interior events emit d=0
    // rows that the filter drops (a singleton session emits both)
    // one hour of µs·2 key space — each window task sorts one hour of
    // boundaries; offsets per hour are collected to the driver (corpus
    // hours, not rows) and broadcast
    val hourSpan = 7200000000L
    val pts = marked.select(explode(array(
        struct(when(col("is_start"), 1L).otherwise(0L).as("d"),
          (unix_micros(col("ts")) * 2).as("k"), col("ts")),
        struct(when(col("is_end"), -1L).otherwise(0L).as("d"),
          (unix_micros(col("ts")) * 2 + 1).as("k"), col("ts")))).as("p"))
      .select(col("p.d").as("d"), col("p.k").as("k"), col("p.ts").as("ts"))
      .filter(col("d") =!= 0L)
      // merge same-key deltas BEFORE the running sum (the oracle's
      // `merged` CTE): with ties unmerged, a group of n end-deltas that
      // is a day's FIRST boundary would expose intermediate running
      // values prev-1..prev-n inside that day, and the day's MAX could
      // read one of them. Keys are unique after the merge, so the
      // window semantics match the oracle exactly.
      .groupBy("k")
      .agg(sum(col("d")).cast("long").as("d"), min(col("ts")).as("ts"))
      // two passes follow (hour totals, the window) — materialize the
      // boundary set, O(sessions), so the event window runs ONCE
      .localCheckpoint()
    val bucket = (col("k") / lit(hourSpan)).cast("long")
    val totals = pts.groupBy(bucket.as("_b")).agg(sum(col("d")).cast("long").as("_t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Long, Long] = {
      var acc = 0L
      totals.map { case (b, t) => val o = b -> acc; acc += t; o }.toMap
    }
    val run = Window.partitionBy("_b").orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("_b", bucket)
      .withColumn("conc",
        sum(col("d")).over(run) +
          coalesce(element_at(typedLit(offsets), col("_b")), lit(0L)))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(max(col("conc")).as("peak_concurrency"))
      .orderBy("day")
  }

  /** q86 — ordered conversion funnel (view → click → purchase): a user
    * advances through step k only if step k's earliest qualifying event is
    * strictly AFTER their step-(k−1) conversion time. Three chained
    * conditional-min aggregates, each a user-keyed groupBy + equi-join —
    * the same shuffle key throughout, so at scale all three stages
    * co-partition on user_id and never move the fact more than once per
    * step. Output is the one-row funnel summary.
    */
  val q86 = Q("q86_conversion_funnel",
    """WITH t1 AS (
      |  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
      |), t2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
      |  WHERE e.event_type = 'click' GROUP BY e.user_id
      |), t3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
      |)
      |SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_view,
      |  CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_click_after_view,
      |  CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_purchase_after_click""".stripMargin) {
    (s, dir) =>
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, tpe: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col("t").as("_pt")), Seq("user_id"))
        .filter(col("ts") > col("_pt"))
        .groupBy("user_id").agg(min(col("ts")).as("t"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t"))
    val t2 = step(t1, "click")
    val t3 = step(t2, "purchase")
    t1.agg(count(lit(1)).as("n_view"))
      .crossJoin(t2.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(t3.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** q87 — retention cohort matrix: users grouped by first-seen day, the
    * classic (cohort_day, day_offset) → distinct-active count triangle.
    * Two user-keyed aggregates and one join on user_id; the output is
    * days² cells — calendar-bounded however large the corpus.
    */
  val q87 = Q("q87_retention_cohorts",
    """WITH firstd AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
      |), act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      |)
      |SELECT f.d0 AS cohort_day, CAST(a.d - f.d0 AS BIGINT) AS day_offset,
      |  CAST(COUNT(*) AS BIGINT) AS n_active
      |FROM act a JOIN firstd f ON a.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_day, day_offset""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    val firstd = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
    val act = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    act.join(firstd, "user_id")
      .groupBy(col("d0").as("cohort_day"), datediff(col("d"), col("d0")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q90 — expanding distinct count (cumulative distinct users per type
    * through each day — the DAU-growth curve). `COUNT(DISTINCT) OVER` an
    * expanding frame is unsupported (Spark) or quadratic (naive rescan);
    * the scale form: a user's first-seen day per type (one keyed
    * aggregate), count first-appearances per (type, day), then a running
    * sum over the CALENDAR per type — the window input is days × types,
    * metadata-sized at any corpus scale.
    */
  val q90 = Q("q90_cumulative_distinct",
    """WITH firstd AS (
      |  SELECT event_type, user_id, MIN(CAST(ts AS DATE)) AS d0
      |  FROM events GROUP BY 1, 2
      |), adds AS (
      |  SELECT event_type, d0 AS day, CAST(COUNT(*) AS BIGINT) AS n_new
      |  FROM firstd GROUP BY 1, 2
      |)
      |SELECT event_type, day, n_new,
      |  CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_distinct_users
      |FROM adds
      |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val firstd = t(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(to_date(col("ts"))).as("d0"))
    val adds = firstd.groupBy(col("event_type"), col("d0").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    adds.select(col("event_type"), col("day"), col("n_new"),
        sum(col("n_new")).over(w).as("cum_distinct_users"))
      .orderBy("event_type", "day")
  }

  /** q91 — behavior transition matrix: counts of consecutive event-type
    * pairs per user timeline (the Markov-chain sufficient statistic
    * behind next-action prediction). One lag window per user — shuffle
    * keyed and parallel by user_id — then a (from, to) hash aggregate
    * with transition share in exact basis points of the from-state total.
    */
  val q91 = Q("q91_type_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), pairs AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM pairs GROUP BY 1
      |)
      |SELECT p.from_type, p.to_type, p.n, (p.n * 10000) // t.n_from AS share_bp
      |FROM pairs p JOIN tot t ON p.from_type = t.from_type
      |ORDER BY p.from_type, p.to_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("from_type").agg(sum(col("n")).cast("long").as("n_from"))
    pairs.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 10000) div n_from").as("share_bp"))
      .orderBy("from_type", "to_type")
  }

  val all: Seq[Q] = Seq(q20, q21, q22, q23, q24, q25, q40, q60, q80, q86, q87, q90, q91)
}
