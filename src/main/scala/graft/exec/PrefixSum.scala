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

  /** Grouped running total: `runningTotal` partitioned by `partCol` —
    * each group gets its own independent prefix sum over `orderCol`,
    * without ever planning a whole-group window (`Window.partitionBy(
    * partCol)` alone makes each GROUP one task — with a handful of
    * sources over 100 TB that is the SinglePartition problem wearing a
    * different hat). Same two-pass scheme: buckets are cut globally on
    * the order key, per-(group, bucket) totals come back to the driver
    * (bounded by |groups| × nBuckets — callers must have bounded group
    * cardinality, e.g. corpus sources), and the window partitions by
    * (group, bucket) so every task sorts one group-slice of one bucket.
    * With `valueCol` = 1 this is a distributed per-group rank.
    */
  def runningTotalBy(df0: DataFrame, partCol: String, orderCol: String,
      valueCol: String, cumCol: String, nBuckets: Int): DataFrame =
    runningTotalBy(df0, partCol, Seq(orderCol), valueCol, cumCol, nBuckets)

  def runningTotalBy(df0: DataFrame, partCol: String, orderCol: String,
      valueCol: String, cumCol: String): DataFrame =
    runningTotalBy(df0, partCol, Seq(orderCol), valueCol, cumCol)

  /** Multi-key form: the running order is (orderCols.head, tail…) —
    * buckets are cut from the HEAD column's value range (it must be
    * integral; ties on it stay inside one bucket, so bucket boundaries
    * always respect the order prefix), the tail columns only break ties
    * inside the window sort.
    */
  def runningTotalBy(df0: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, cumCol: String, nBuckets: Int = 32): DataFrame = {
    val headCol = orderCols.head
    val df =
      if (df0.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD") df0
      else df0.localCheckpoint()
    val bounds = df.agg(min(col(headCol)).cast("long"), max(col(headCol)).cast("long")).head()
    if (bounds.isNullAt(0)) return df.withColumn(cumCol, col(valueCol).cast("long"))
    val mn = bounds.getLong(0)
    val mx = bounds.getLong(1)
    val step = math.max(1L, (mx - mn) / nBuckets + 1)
    val bucket = floor((col(headCol).cast("long") - lit(mn)) / lit(step)).cast("int")

    val totals = df.groupBy(col(partCol).cast("string").as("_g"), bucket.as("_bucket"))
      .agg(sum(col(valueCol)).cast("long").as("_t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    // exclusive prefix over bucket totals WITHIN each group, keyed
    // "group#bucket" (element_at has no composite-key form)
    val offsets: Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      totals.map { case (g, b, t) =>
        val o = s"$g#$b" -> acc(g); acc(g) += t; o
      }.toMap
    }

    val w = Window.partitionBy(partCol, "_bucket").orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_bucket", bucket)
      .withColumn(cumCol,
        sum(col(valueCol)).over(w).cast("long") +
          coalesce(
            element_at(typedLit(offsets),
              concat(col(partCol).cast("string"), lit("#"), col("_bucket").cast("string"))),
            lit(0L)))
      .drop("_bucket")
  }

  /** Distributed GLOBAL total-order rank (1-based): the position of every
    * row in the total order (bucketCol asc, orderCols asc) — without the
    * `Window.orderBy` global sort that plans `Exchange SinglePartition`.
    * The caller provides an integral `bucketCol` whose ascending numeric
    * order IS the leading consumption order (e.g. phase·nShards + shard);
    * per-bucket counts come back to the driver (bounded by bucket
    * cardinality — callers must keep buckets bounded, like shard counts),
    * turn into exclusive offsets, and each row's global position is its
    * bucket offset plus its rank WITHIN the bucket (a window partitioned
    * by bucket — every task sorts one bucket, never the corpus).
    */
  def globalRank(df0: DataFrame, bucketCol: String, orderCols: Seq[String],
      outCol: String): DataFrame = {
    val df =
      if (df0.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD") df0
      else df0.localCheckpoint()
    val counts = df.groupBy(col(bucketCol).cast("long").as("_b"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Long, Long] = {
      var acc = 0L
      counts.map { case (b, n) => val o = b -> acc; acc += n; o }.toMap
    }
    val w = Window.partitionBy(bucketCol).orderBy(orderCols.map(col): _*)
    df.withColumn(outCol,
      row_number().over(w).cast("long") +
        coalesce(element_at(typedLit(offsets), col(bucketCol).cast("long")), lit(0L)))
  }

  /** `globalRank`'s SUM sibling: the running total of `valueCol` in the
    * global total order (bucketCol asc, orderCols asc) — per-bucket SUM
    * offsets to the driver (bounded by bucket cardinality), within-bucket
    * window sums in parallel. The cumulative-consumption primitive: "how
    * much mass precedes this row in consumption order" without a global
    * sort.
    */
  def globalRunningTotal(df0: DataFrame, bucketCol: String,
      orderCols: Seq[String], valueCol: String, outCol: String): DataFrame = {
    val df =
      if (df0.queryExecution.analyzed.getClass.getSimpleName == "LogicalRDD") df0
      else df0.localCheckpoint()
    val totals = df.groupBy(col(bucketCol).cast("long").as("_b"))
      .agg(sum(col(valueCol)).cast("long").as("_t"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Long, Long] = {
      var acc = 0L
      totals.map { case (b, t) => val o = b -> acc; acc += t; o }.toMap
    }
    val w = Window.partitionBy(bucketCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol,
      sum(col(valueCol)).over(w).cast("long") +
        coalesce(element_at(typedLit(offsets), col(bucketCol).cast("long")), lit(0L)))
  }
}
