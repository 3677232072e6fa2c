package graft.ops

import graft.Catalog
import graft.queries.{Det, Q}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second operator Spark lacks a native
  * physical strategy for (a point-in-interval predicate alone plans as a
  * broadcast-nested-loop or cartesian filter). Composed with the standard
  * binning rewrite: bucketize interval ends and points into fixed-width
  * bins, equi-join on (key, bin), then apply the exact range predicate.
  * Every point lands in exactly one bin, so no post-join dedup is needed;
  * the shuffle is an ordinary hash partition on (key, bin) and work scales
  * with true match density instead of |left|×|right|. DuckDB's plain
  * BETWEEN join is the oracle.
  */
object RangeJoin {

  /** Equi-key + point-in-[start,end) join via binning.
    * `binSeconds` must be ≥ the maximum interval length so an interval
    * spans at most two bins (generalizing to longer intervals just
    * explodes more bins per interval).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTs: String,
      startTs: String,
      endTs: String,
      binSeconds: Long): DataFrame = {
    val startBin = (unix_timestamp(col(startTs)) / binSeconds).cast("long")
    val endBin = (unix_timestamp(col(endTs)) / binSeconds).cast("long")
    val binned = intervals.withColumn("_bin",
      explode(sequence(startBin, endBin)))
    val p = points.withColumn("_bin",
      (unix_timestamp(col(pointTs)) / binSeconds).cast("long"))
    p.join(binned, Seq(key, "_bin"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("_bin")
  }

  /** q18 — purchases joined to the trailing one-hour window after each
    * error of the same user: how many recent errors preceded the purchase
    * and their total magnitude (left semantics: purchases with no recent
    * error report zeros).
    */
  val q18 = Q("q18_range_join_recent_errors",
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
      |), e AS (
      |  SELECT user_id, ts AS err_start, ts + INTERVAL 1 HOUR AS err_end, value AS err_value
      |  FROM events WHERE event_type = 'error'
      |), m AS (
      |  SELECT p.event_id, p.user_id, p.ts,
      |    COUNT(*) AS n_recent_errors,
      |    SUM(CAST(FLOOR((e.err_value) * 10000.0) AS BIGINT)) / 10000.0 AS err_value_sum
      |  FROM p JOIN e
      |    ON p.user_id = e.user_id AND p.ts >= e.err_start AND p.ts < e.err_end
      |  GROUP BY p.event_id, p.user_id, p.ts
      |)
      |SELECT p.event_id, p.user_id, p.ts,
      |  CAST(COALESCE(m.n_recent_errors, 0) AS BIGINT) AS n_recent_errors,
      |  COALESCE(m.err_value_sum, 0.0) AS err_value_sum
      |FROM p LEFT JOIN m ON p.event_id = m.event_id
      |ORDER BY p.event_id""".stripMargin) { (s, dir) =>
    val ev = Catalog.table(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("err_end"),
        col("value").as("err_value"))
    val matched = pointInInterval(purchases, intervals,
      key = "user_id", pointTs = "ts", startTs = "err_start", endTs = "err_end",
      binSeconds = 3600L)
      .groupBy("event_id")
      .agg(
        count(lit(1)).as("m_n"),
        Det.dsum(col("err_value")).as("m_sum"))
    purchases.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        coalesce(col("m_n"), lit(0L)).as("n_recent_errors"),
        coalesce(col("m_sum"), lit(0.0)).as("err_value_sum"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(q18)
}
