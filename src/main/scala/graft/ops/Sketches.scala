package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Q

/** HyperLogLog distinct sketches — the fixed-memory, mergeable
  * count-distinct structure a 100 TB pipeline keeps when COUNT(DISTINCT)'s
  * expand + full-key shuffle is too wide (the register build shuffles at
  * most |groups| × m register rows regardless of corpus size, and partials
  * combine map-side via max). Complements the exact operators: q15's
  * bitmap TypedImperativeAggregate (exact, memory ∝ key range) and q90's
  * cumulative distinct (exact, expand-based).
  *
  * m = 2^p registers is the memory/accuracy knob (σ ≈ 1.04/√m): q108 runs
  * p = 8 (256 registers, σ ≈ 6.5%) over ~1.6k-cardinality groups; q109
  * runs p = 6 because its user-level cardinality (~150 at verify scale)
  * sits just above the raw estimator's ≈ 2.5·m small-range boundary at
  * m = 64 and far below it at m = 256.
  *
  * Everything before the final division is integer arithmetic on h60
  * hashes (md5-prefix, graft.functions.TextHash scheme), so the estimates
  * themselves are DuckDB-oracled bit-for-bit: Σ 2^−r is carried as the
  * BIGINT Σ 2^(maxRho−r) (scale 2^−maxRho; max 2^p · 2^(61−p) = 2^61 at
  * any p), and only the closing α·m² / Σ division runs in doubles — the
  * same IEEE operations in the same order in both engines, with α inlined
  * into the oracle SQL from the Scala double (shortest-roundtrip printing
  * parses back to the identical double). The raw Flajolet–Fusy–Gandouet–
  * Meunier estimator only (no linear-counting small-range correction: its
  * m·ln(m/V) term is transcendental and libm vs JVM differ in the last
  * ulp, which would break oracle parity; production use below n ≈ 2.5·m
  * would add it — callers here stay above that regime).
  */
object Sketches {

  /** Standard bias constant α_m. */
  def alphaFor(p: Int): Double = (1 << p) match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case m  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** rho of an all-zero (60−p)-bit h60 suffix. */
  def maxRho(p: Int): Int = 60 - p + 1

  private def ev(s: SparkSession, dir: String) = graft.Catalog.table(s, dir, "events")

  /** First p register-index bits of an h60 hash. */
  def hllBucket(h60: Column, p: Int): Column = h60 % (1L << p)

  /** rho: 1-based position of the highest set bit in the remaining
    * (60−p)-bit suffix, maxRho when the suffix is zero. bin() emits the
    * same no-leading-zeros binary string in Spark and DuckDB, so
    * maxRho − length(bin(w)) needs no transcendental log2.
    */
  def hllRho(h60: Column, p: Int): Column = {
    val w = shiftright(h60, p)
    when(w === 0L, lit(maxRho(p))).otherwise(lit(maxRho(p)) - length(bin(w)))
  }

  /** Per-group HLL registers (groupCols…, bucket, r): ONE partial+final
    * hash aggregate over at most |groups| × m cells — no expand, no
    * per-key shuffle. `key` must be a string column expression.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column, p: Int): DataFrame = {
    val h = Dedup.h60Col(key)
    df.groupBy(groupCols.map(col) :+ hllBucket(h, p).as("bucket"): _*)
      .agg(max(hllRho(h, p)).as("r"))
  }

  /** Fold registers (shape: groupCols…, bucket, r) to the raw estimate:
    * (groupCols…, n_buckets, reg_denom, hll_estimate). reg_denom is the
    * exact BIGINT Σ 2^(maxRho−r) with absent buckets contributing r = 0.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1L << p
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${maxRho(p)} - r)")).as("denom_present"))
      .withColumn("reg_denom",
        (col("denom_present") + (lit(m) - col("n_buckets")) * lit(1L << maxRho(p)))
          .cast("long"))
      .withColumn("hll_estimate",
        lit(alphaFor(p)) * lit((m * m).toDouble) * lit(math.pow(2.0, maxRho(p)))
          / col("reg_denom").cast("double"))
      .drop("denom_present")
  }

  /** Oracle fragments mirroring the three helpers above, parameterized the
    * same way. Kept adjacent to the Scala so the two register pipelines
    * stay textually in sync.
    */
  private def regSql(keyExpr: String, groupBy: String, p: Int): String = {
    val h = Dedup.h60Sql(keyExpr)
    s"""SELECT $groupBy, $h % ${1L << p} AS bucket,
       |    MAX(CASE WHEN $h // ${1L << p} = 0 THEN ${maxRho(p)}
       |             ELSE ${maxRho(p)} - length(bin($h // ${1L << p})) END) AS r
       |  FROM events GROUP BY ALL""".stripMargin
  }

  private def foldDenom(p: Int): String =
    s"CAST(CAST(SUM(CAST(1 AS BIGINT) << (${maxRho(p)} - r)) AS BIGINT)" +
      s" + (${1L << p} - COUNT(*)) * (CAST(1 AS BIGINT) << ${maxRho(p)}) AS BIGINT)"

  private def estimateSql(p: Int): String = {
    val m = 1L << p
    s"((CAST(${alphaFor(p)} AS DOUBLE) * CAST(${m * m} AS DOUBLE))" +
      s" * CAST(${1L << maxRho(p)} AS DOUBLE)) / CAST(reg_denom AS DOUBLE)"
  }

  /** Key for q108: one token per active (user, day) pair. */
  private val userDayKey = "CAST(user_id AS VARCHAR) || '@' || CAST(CAST(ts AS DATE) AS VARCHAR)"

  /** q108 — groupwise HLL distinct: active user-days per event type at
    * p = 8, the sketch estimate beside the exact count (like q64's
    * CMS-vs-exact). The sketch path is two hash aggregates totalling
    * |types| × 256 register rows; the exact COUNT(DISTINCT) twin it
    * replaces at scale shuffles every distinct key.
    */
  val q108 = Q("q108_hll_distinct",
    s"""WITH reg AS (
       |  ${regSql(userDayKey, "event_type", 8)}
       |), fold AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |    ${foldDenom(8)} AS reg_denom
       |  FROM reg GROUP BY event_type
       |), ex AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT $userDayKey) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT f.event_type, x.n_exact, f.n_buckets, f.reg_denom,
       |  ${estimateSql(8)} AS hll_estimate
       |FROM fold f JOIN ex x USING (event_type)
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val e = ev(s, dir)
    val key = concat(col("user_id").cast("string"), lit("@"),
      col("ts").cast("date").cast("string"))
    val est = hllEstimate(hllRegisters(e, Seq("event_type"), key, 8), Seq("event_type"), 8)
    val exact = e.groupBy("event_type").agg(countDistinct(key).as("n_exact"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_buckets"),
        col("reg_denom"), col("hll_estimate"))
      .orderBy("event_type")
  }

  /** q109 — sketch-merge algebra: per-day user sketches (what a pipeline
    * would persist per ingest partition) merged across the month by
    * register-wise MAX, beside the sketch computed directly over the whole
    * table. The two estimates are bit-equal (max is associative), which
    * `merge_exact_match` pins in-query: monthly uniques come from 30 tiny
    * artifacts with NO rescan of history — the incremental twin of q90's
    * exact cumulative distinct.
    */
  val q109 = Q("q109_hll_merge",
    s"""WITH daily AS (
       |  ${regSql("CAST(user_id AS VARCHAR)", "event_type, CAST(ts AS DATE) AS day", 6)}
       |), merged_reg AS (
       |  SELECT event_type, bucket, MAX(r) AS r FROM daily GROUP BY event_type, bucket
       |), merged AS (
       |  SELECT event_type, reg_denom, ${estimateSql(6)} AS merged_estimate FROM (
       |    SELECT event_type, ${foldDenom(6)} AS reg_denom
       |    FROM merged_reg GROUP BY event_type)
       |), direct_reg AS (
       |  ${regSql("CAST(user_id AS VARCHAR)", "event_type", 6)}
       |), direct AS (
       |  SELECT event_type, reg_denom, ${estimateSql(6)} AS direct_estimate FROM (
       |    SELECT event_type, ${foldDenom(6)} AS reg_denom
       |    FROM direct_reg GROUP BY event_type)
       |), days AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
       |  FROM events GROUP BY event_type
       |)
       |SELECT m.event_type, d2.n_days, d2.n_exact,
       |  m.merged_estimate, d.direct_estimate,
       |  m.reg_denom = d.reg_denom AS merge_exact_match
       |FROM merged m
       |JOIN direct d USING (event_type)
       |JOIN days d2 USING (event_type)
       |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val e = ev(s, dir).withColumn("day", col("ts").cast("date"))
    val key = col("user_id").cast("string")
    val daily = hllRegisters(e, Seq("event_type", "day"), key, 6)
    val merged = hllEstimate(
      daily.groupBy("event_type", "bucket").agg(max("r").as("r")), Seq("event_type"), 6)
      .select(col("event_type"), col("reg_denom").as("m_denom"),
        col("hll_estimate").as("merged_estimate"))
    val direct = hllEstimate(hllRegisters(e, Seq("event_type"), key, 6), Seq("event_type"), 6)
      .select(col("event_type"), col("reg_denom").as("d_denom"),
        col("hll_estimate").as("direct_estimate"))
    val days = e.groupBy("event_type")
      .agg(countDistinct(col("day")).as("n_days"), countDistinct(key).as("n_exact"))
    merged.join(direct, "event_type").join(days, "event_type")
      .select(col("event_type"), col("n_days"), col("n_exact"),
        col("merged_estimate"), col("direct_estimate"),
        (col("m_denom") === col("d_denom")).as("merge_exact_match"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(q108, q109)
}
