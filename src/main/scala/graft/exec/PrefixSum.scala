package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) without a single-partition
  * global window.
  *
  * `Window.orderBy(k)` with no partitionBy plans `Exchange SinglePartition`
  * — Spark moves the ENTIRE input to one task, the canonical 100 TB
  * killer. The scale-safe equivalent is the classic two-pass scan:
  *
  *   1. deterministically range-bucket rows by the (integral) order key;
  *   2. aggregate a per-bucket total (one small job, ≤ nBuckets rows to
  *      the driver) and turn it into an exclusive cumulative offset per
  *      bucket;
  *   3. run the running sum as a window PARTITIONED by bucket (parallel,
  *      each task sorts ~1/nBuckets of the data) and add the broadcast
  *      bucket offset.
  *
  * Bucketing is computed from the key VALUE (fixed-stride over the
  * driver-fetched min/max), not `repartitionByRange`, because the range
  * sampler is nondeterministic across jobs — the totals pass and the
  * window pass must agree on bucket membership regardless of caching.
  * The input IS materialized (one `localCheckpoint`) before the passes,
  * so the upstream plan — e.g. q56's tokenization — runs once, not once
  * per pass.
  * On a cluster, nBuckets scales with executors; each task's sort stays
  * bounded by bucket size rather than corpus size.
  *
  * Requires a unique integral order key (ties would make any running
  * total nondeterministic — same as the naive global window).
  */
object PrefixSum {

  def runningTotal(df0: DataFrame, orderCol: String, valueCol: String,
      cumCol: String, nBuckets: Int = 32): DataFrame = {
    // Three passes follow (bounds, bucket totals, the window itself) —
    // against a lazy input each pass recomputes the upstream plan from
    // the source scan (q56 measured 3× its tokenization cost before
    // this). Materialize once unless the caller already handed us a
    // checkpointed/materialized frame (analyzed plan is a LogicalRDD).
    val df =
      if (df0.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD") df0
      else df0.localCheckpoint()
    val bounds = df.agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return df.withColumn(cumCol, col(valueCol).cast("long"))
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    val step = math.max(1L, (mx - mn) / nBuckets + 1)
    val bucket = floor((col(orderCol).cast("long") - lit(mn)) / lit(step)).cast("int")

    val totals = df.groupBy(bucket.as("_bucket"))
      .agg(sum(col(valueCol)).cast("long").as("_t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix over bucket totals — the broadcast offsets
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (b, t) => val o = b -> acc; acc += t; o }.toMap
    }

    val w = Window.partitionBy("_bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_bucket", bucket)
      .withColumn(cumCol,
        sum(col(valueCol)).over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("_bucket")), lit(0L)))
      .drop("_bucket")
  }
}
