package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Determinism helpers for oracle (DuckDB) hash-parity.
  *
  * Floating-point SUM/AVG/STDDEV over doubles is order-dependent, and Spark's
  * partial-aggregation order differs from DuckDB's sequential scan. Worse,
  * double→decimal casts round differently at representation edge cases in the
  * two engines. The bit-deterministic route: scale the double by 10^s with an
  * IEEE multiply (identical in both engines), FLOOR it (identical), cast the
  * now-integral double to BIGINT (exact), sum as exact integers, and divide
  * the final integer sum by 10^s in double (identical). Every step is
  * order-independent or exact, so both engines produce the same bits.
  *
  * The oracle SQL must mirror the same expression tree — see the paired SQL
  * strings next to each query definition.
  */
object Det {

  /** Exact fixed-point sum (s=4 decimal digits), returned as double.
    * SQL mirror: `SUM(CAST(FLOOR(x * 10000.0) AS BIGINT)) / 10000.0`.
    */
  def dsum(c: Column, scale: Int = 4): Column = {
    val f = math.pow(10.0, scale)
    sum(floor(c * lit(f))) / lit(f)
  }

  /** Partial-level raw fixed-point sum (a LONG, no final divide) — for
    * two-level aggregations: pre-aggregate facts with dsumRaw, re-sum the
    * longs after joins, divide once at the end. Integer sums re-associate
    * exactly, so the result is bit-identical to a single-level dsum.
    */
  def dsumRaw(c: Column, scale: Int = 4): Column =
    sum(floor(c * lit(math.pow(10.0, scale))))

  /** Fixed-point average over non-null values.
    * SQL mirror: `SUM(CAST(FLOOR(x * 10000.0) AS BIGINT)) / 10000.0 / COUNT(x)`.
    */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Sample stddev from exact fixed-point sums (scale 6):
    * sqrt((S2 - S1*S1/n) / (n-1)), null when n < 2. S1 = dsum(x,6),
    * S2 = dsum(x*x, 6). Both engines compute identical doubles throughout.
    * SQL mirror (with S1/S2 spelled out):
    * `CASE WHEN COUNT(x) > 1 THEN SQRT((S2 - S1*S1/COUNT(x)) / (COUNT(x)-1)) END`.
    */
  def dstddev(c: Column): Column = {
    val n  = count(c).cast(DoubleType)
    val s1 = dsum(c, 6)
    val s2 = dsum(c * c, 6)
    when(count(c) > 1, sqrt((s2 - s1 * s1 / n) / (n - lit(1.0))))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Conditional count `SUM(CASE WHEN cond THEN 1 ELSE 0 END)` (SURVEY A5). */
  def countIf(cond: Column): Column =
    sum(when(cond, 1L).otherwise(0L))

  /** Deterministic half-up rounding for non-negative computed doubles:
    * FLOOR(x*10^s + 0.5)/10^s — every step is IEEE-identical across
    * engines, unlike round(), whose exact-decimal (Spark) vs scaled-double
    * (DuckDB) semantics disagree within 1 ulp of a tie.
    * SQL mirror: `FLOOR(x * 10.0 + 0.5) / 10.0` (scale 1).
    */
  def dround(c: Column, scale: Int): Column = {
    val f = math.pow(10.0, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }
}
