package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group median by histogram rank selection.
  *
  * The naive form — `row_number() OVER (PARTITION BY grp ORDER BY v)` —
  * sorts every group in full, so parallelism is capped at the number of
  * groups and each task sorts its ENTIRE group: with 5 event types a
  * 1000-executor cluster uses 5 tasks. This operator instead locates the
  * median's value bucket first and sorts only that bucket:
  *
  *   1. per-group min/max/count (one hash aggregate, #groups rows to the
  *      driver);
  *   2. fixed-stride value histogram: count per (group, bucket) — one
  *      hash aggregate, ≤ #groups × nBuckets rows to the driver;
  *   3. driver walks each group's histogram to find the bucket holding
  *      rank ⌊(n+1)/2⌋ and the residual rank within it (pure metadata,
  *      no data rows);
  *   4. second pass filters to the median buckets only (~1/nBuckets of
  *      each group) and rank-selects inside them.
  *
  * Work in the final sort is n/nBuckets per group instead of n; nBuckets
  * scales with the cluster (or recurse on the bucket for pathological
  * skew). Buckets are derived from the value itself, so equal values —
  * which must stay contiguous under (value, tie) ordering — always share
  * a bucket, making the in-bucket rank consistent with the global rank.
  * Returns one row per group: (groupCol, median_value, n).
  */
object RankSelect {

  def groupMedian(df: DataFrame, groupCol: String, valueCol: String, tieCol: String,
      nBuckets: Int = 64): DataFrame = {
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

    // locate, per group, the bucket containing the lower-median rank and
    // the residual rank within that bucket
    val targets = bounds.map { case (g, _, _, n) =>
      val rank = (n + 1) / 2 // lower-median rank, matches FLOOR((n+1)/2.0)
      val buckets = hist(g).sortBy(_._2)
      var acc = 0L
      var i = 0
      while (acc + buckets(i)._3 < rank) { acc += buckets(i)._3; i += 1 }
      (g, buckets(i)._2, rank - acc, n)
    }.toSeq.toDF(groupCol, "_mb", "_rank", "n")

    // pass 3: sort ONLY the median buckets (≈ n/nBuckets rows per group)
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol), col(tieCol))
    df.join(broadcast(strides), Seq(groupCol))
      .join(broadcast(targets), Seq(groupCol))
      .filter(bucketOf(col(valueCol)) === col("_mb"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === col("_rank"))
      .select(col(groupCol), col(valueCol).as("median_value"), col("n"))
  }
}
