package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group order statistics (median, arbitrary quantiles) by
  * radix-histogram rank selection.
  *
  * The naive form — `row_number() OVER (PARTITION BY grp ORDER BY v)` —
  * sorts every group in full, so parallelism is capped at the number of
  * groups and each task sorts its ENTIRE group: with 5 event types a
  * 1000-executor cluster uses 5 tasks. This operator instead locates each
  * target rank's value bucket first and sorts only those buckets:
  *
  *   1. one histogram pass: count per (group, radix bucket), where the
  *      bucket is the top 12 bits of the ORDER-PRESERVING long encoding
  *      of the double value (IEEE trick: flip all bits of negatives, flip
  *      the sign bit of non-negatives — long order ≡ double order). The
  *      bucket is a pure function of the value — no bounds pass, no
  *      stride metadata, and heavy value skew just lands more rows in one
  *      bucket without breaking correctness. ≤ #groups × 4096 rows reach
  *      the driver (sparse in practice);
  *   2. driver walks each group's histogram to find, for every requested
  *      quantile, the bucket holding its rank and the residual rank
  *      within that bucket (pure metadata, no data rows);
  *   3. second pass semi-joins to the needed buckets only and
  *      rank-selects inside them.
  *
  * Work in the final sort is the hit buckets' occupancy, not n; for
  * pathological skew (everything in one bucket) recurse on the next 12
  * bits — the plain histogram stays correct either way because equal
  * values always share a bucket, keeping in-bucket (value, tie) rank
  * consistent with the global rank.
  *
  * Quantile rank convention: rank_p = ⌊(n−1)·p⌋ + 1 (1-based element
  * selection, no interpolation — both engines return an input value
  * verbatim, which keeps the DuckDB oracle bit-exact). p = 0.5 equals the
  * lower median ⌊(n+1)/2⌋ for every n.
  */
object RankSelect {

  private val BucketBits = 12

  /** Order-preserving bucket of a double-typed column: top BucketBits of
    * the monotone long encoding — flip all bits of negatives (raw sign
    * bit 1), flip only the sign bit of non-negatives, and the UNSIGNED
    * long order equals the double order, so `>>> (64−BucketBits)`
    * extracts an order-preserving bucket in [0, 2^BucketBits).
    */
  private def radixBucket(v: org.apache.spark.sql.Column) = {
    val raw = graft.functions.DoubleBits(v)
    val mapped = when(raw < 0, bitwise_not(raw)).otherwise(raw.bitwiseXOR(lit(Long.MinValue)))
    shiftrightunsigned(mapped, 64 - BucketBits).cast("int")
  }

  /** One output row per group: (groupCol, n, <label per quantile>). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String, tieCol: String,
      quantiles: Seq[(String, Double)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.DoubleBits.register(spark)

    // pass 1: (group, radix-bucket) histogram — small enough to reason
    // about on the driver, never the data itself
    val hist = df
      .groupBy(col(groupCol), radixBucket(col(valueCol)).as("_bucket"))
      .agg(count(lit(1)).as("_c"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)

    // locate, per group × quantile, the bucket containing the target rank
    // and the residual rank within that bucket (driver-side metadata walk)
    val targets = hist.toSeq.flatMap { case (g, rows) =>
      val buckets = rows.sortBy(_._2)
      val n = rows.map(_._3).sum
      quantiles.map { case (label, p) =>
        val rank = math.floor((n - 1) * p).toLong + 1
        var acc = 0L
        var i = 0
        while (acc + buckets(i)._3 < rank) { acc += buckets(i)._3; i += 1 }
        (g, label, buckets(i)._2, rank - acc, n)
      }
    }.toDF(groupCol, "_label", "_mb", "_rank", "n")

    // pass 2: rank within ONLY the needed buckets, then pick each
    // quantile's residual rank
    val neededBuckets = targets.select(col(groupCol), col("_mb").as("_bucket")).distinct()
    val w = Window.partitionBy(groupCol, "_bucket").orderBy(col(valueCol), col(tieCol))
    val ranked = df
      .withColumn("_bucket", radixBucket(col(valueCol)))
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
  def groupMedian(df: DataFrame, groupCol: String, valueCol: String,
      tieCol: String): DataFrame =
    groupQuantiles(df, groupCol, valueCol, tieCol, Seq("median_value" -> 0.5))
      .select(col(groupCol), col("median_value"), col("n"))
}
