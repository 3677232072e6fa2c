package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics (median, arbitrary quantiles) by
  * histogram rank selection.
  *
  * The naive form — `row_number() OVER (PARTITION BY grp ORDER BY v)` —
  * sorts every group in full, so parallelism is capped at the number of
  * groups and each task sorts its ENTIRE group: with 5 event types a
  * 1000-executor cluster uses 5 tasks. This operator instead locates each
  * target rank's value bucket first and sorts only those buckets:
  *
  *   1. per-group min/max/count (one hash aggregate, #groups rows to the
  *      driver);
  *   2. fixed-stride value histogram: count per (group, bucket) — one
  *      hash aggregate, ≤ #groups × nBuckets rows to the driver;
  *   3. driver walks each group's histogram to find, for every requested
  *      quantile, the bucket holding its rank and the residual rank
  *      within that bucket (pure metadata, no data rows);
  *   4. second pass semi-joins to the needed buckets only (~1/nBuckets of
  *      each group per target) and rank-selects inside them.
  *
  * Work in the final sort is n/nBuckets per group instead of n; nBuckets
  * scales with the cluster (or recurse on a bucket for pathological
  * skew). Buckets are derived from the value itself, so equal values —
  * which must stay contiguous under (value, tie) ordering — always share
  * a bucket, making the in-bucket rank consistent with the global rank.
  *
  * Quantile rank convention: rank_p = ⌊(n−1)·p⌋ + 1 (1-based element
  * selection, no interpolation — both engines return an input value
  * verbatim, which keeps the DuckDB oracle bit-exact). p = 0.5 equals the
  * lower median ⌊(n+1)/2⌋ for every n.
  */
object RankSelect {

  /** One output row per group: (groupCol, n, <label per quantile>). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String, tieCol: String,
      quantiles: Seq[(String, Double)], nBuckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // pass 1: per-group bounds + count (drives the per-group bucket stride)
    val bounds = df.groupBy(groupCol)
      .agg(min(col(valueCol)).cast("double").as("mn"),
        max(col(valueCol)).cast("double").as("mx"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val strides = bounds.map { case (g, mn, mx, _) =>
      (g, mn, if (mx > mn) (mx - mn) / nBuckets else 1.0)
    }.toSeq.toDF(groupCol, "_mn", "_step")

    def bucketOf(v: org.apache.spark.sql.Column) =
      least(floor((v - col("_mn")) / col("_step")).cast("int"), lit(nBuckets - 1))

    // pass 2: (group, bucket) histogram — small enough to reason about on
    // the driver, never the data itself
    val hist = df.join(broadcast(strides), groupCol)
      .groupBy(col(groupCol), bucketOf(col(valueCol)).as("_bucket"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)

    // locate, per group × quantile, the bucket containing the target rank
    // and the residual rank within that bucket
    val targets = bounds.flatMap { case (g, _, _, n) =>
      val buckets = hist(g).sortBy(_._2)
      quantiles.map { case (label, p) =>
        val rank = math.floor((n - 1) * p).toLong + 1
        var acc = 0L
        var i = 0
        while (acc + buckets(i)._3 < rank) { acc += buckets(i)._3; i += 1 }
        (g, label, buckets(i)._2, rank - acc, n)
      }
    }.toSeq.toDF(groupCol, "_label", "_mb", "_rank", "n")

    // pass 3: rank within ONLY the needed buckets (≈ n/nBuckets rows per
    // group per target), then pick each quantile's residual rank
    val neededBuckets = targets.select(col(groupCol), col("_mb").as("_bucket")).distinct()
    val w = Window.partitionBy(groupCol, "_bucket").orderBy(col(valueCol), col(tieCol))
    val ranked = df.join(broadcast(strides), Seq(groupCol))
      .withColumn("_bucket", bucketOf(col(valueCol)))
      .join(broadcast(neededBuckets), Seq(groupCol, "_bucket"), "left_semi")
      .withColumn("_rn", row_number().over(w))
    val picked = ranked
      .join(broadcast(targets),
        ranked(groupCol) === targets(groupCol) && col("_bucket") === col("_mb") &&
          col("_rn") === col("_rank"))
      .select(ranked(groupCol), col("_label"), col(valueCol), col("n"))
    picked.groupBy(col(groupCol), col("n"))
      .pivot("_label", quantiles.map(_._1))
      .agg(first(col(valueCol)))
      .select(col(groupCol) +: col("n") +: quantiles.map(q => col(q._1)): _*)
  }

  /** Lower-median element per group: (groupCol, median_value, n). */
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String, tieCol: String,
      nBuckets: Int = 64): DataFrame =
    groupQuantiles(df, groupCol, valueCol, tieCol, Seq("median_value" -> 0.5), nBuckets)
      .select(col(groupCol), col("median_value"), col("n"))
}
