package graft.ops

import graft.Catalog
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator Spark lacks natively, composed from
  * built-ins per the preference order (union + running `last(ignoreNulls)`
  * window, no custom physical operator needed): for every left row, attach
  * the latest right row whose timestamp is ≤ the left timestamp within the
  * same key.
  *
  * Execution shape: one shuffle on the key columns and one sort within
  * partitions — identical to how a native sort-merge as-of executes, so it
  * scales like an ordinary window aggregation (state is a single running
  * struct per key; skewed keys are ordinary window skew). DuckDB's native
  * ASOF JOIN provides the oracle.
  *
  * Determinism: callers must ensure (by, rightTs) is unique — with two
  * right rows at the same instant, "the latest" is ill-defined in any
  * as-of engine.
  */
object AsOf {

  /** Left as-of-backward join. Returns all left columns plus a nullable
    * `asof` struct holding the matched right row (null when no right row
    * precedes the left timestamp).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val l = left.select(
      by.map(col) ++ Seq(col(leftTs).as("_t"), lit(1).as("_side"),
        lStruct.as("_l"), lit(null).cast(rType).as("_r")): _*)
    val r = right.select(
      by.map(col) ++ Seq(col(rightTs).as("_t"), lit(0).as("_side"),
        lit(null).cast(lType).as("_l"), rStruct.as("_r")): _*)
    // right rows sort before left rows at equal timestamps → `<=` semantics
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("asof"))
  }

  /** q17 — as-of join on the events stream: each purchase picks up the
    * most recent prior error of the same user (the classic
    * state-at-event-time enrichment). Oracle: DuckDB's native ASOF JOIN.
    */
  val q17 = Q("q17_asof_last_error",
    """WITH p AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
      |), e AS (
      |  SELECT event_id AS err_event_id, user_id, ts AS err_ts, value AS err_value
      |  FROM events WHERE event_type = 'error'
      |)
      |SELECT p.event_id, p.user_id, p.ts, p.value,
      |  e.err_event_id, e.err_ts, e.err_value
      |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND e.err_ts <= p.ts
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = Catalog.table(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_event_id"), col("user_id"),
        col("ts").as("err_ts"), col("value").as("err_value"))
    join(purchases, errors, by = Seq("user_id"), leftTs = "ts", rightTs = "err_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof.err_event_id").as("err_event_id"),
        col("asof.err_ts").as("err_ts"),
        col("asof.err_value").as("err_value"))
      .orderBy("event_id")
  }

  /** As-of-backward join with a match tolerance (pandas `merge_asof
    * tolerance=` / QuestDB `ASOF JOIN ... TOLERANCE`): a right row older
    * than `tolerance` is no match at all. Same execution shape as
    * `join` — the tolerance is a post-window null-out, zero extra
    * shuffles.
    */
  def joinWithTolerance(
      left: DataFrame,
      right: DataFrame,
      by: Seq[String],
      leftTs: String,
      rightTs: String,
      tolerance: String): DataFrame =
    join(left, right, by, leftTs, rightTs)
      .withColumn("asof",
        when(col(leftTs) <= col(s"asof.$rightTs") + expr(s"INTERVAL $tolerance"), col("asof")))

  /** q81 — tolerance-bounded as-of: a purchase is only enriched by an
    * error from the trailing 30 minutes; staler state is null, not
    * silently ancient (the difference between "last known state" and
    * "last RELEVANT state" in feature engineering).
    */
  val q81 = Q("q81_asof_tolerance",
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), e AS (
      |  SELECT event_id AS err_event_id, user_id, ts AS err_ts
      |  FROM events WHERE event_type = 'error'
      |)
      |SELECT p.event_id, p.user_id, p.ts,
      |  CASE WHEN p.ts <= e.err_ts + INTERVAL 30 MINUTE THEN e.err_event_id END AS err_event_id,
      |  CASE WHEN p.ts <= e.err_ts + INTERVAL 30 MINUTE THEN e.err_ts END AS err_ts
      |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND e.err_ts <= p.ts
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = Catalog.table(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_event_id"), col("user_id"), col("ts").as("err_ts"))
    joinWithTolerance(purchases, errors, by = Seq("user_id"),
        leftTs = "ts", rightTs = "err_ts", tolerance = "30 MINUTES")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof.err_event_id").as("err_event_id"),
        col("asof.err_ts").as("err_ts"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(q17, q81)
}
