package graft.streaming

import graft.ops.Corpus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming drift maintenance — q126's monitoring run continuously:
  * the (source, bin) histogram cells are ADD-mergeable (plain count
  * sums), so each micro-batch's partial cell table (≤ sources × bins
  * rows) is all the state the stream needs, and the per-snapshot χ²
  * check serves off the folded artifact with zero document rescans.
  * Same delta discipline as ShardStream: SUM is not idempotent, so
  * deltas land as per-batchId partition overwrites (replay-safe), and
  * serving folds the delta store — O(batches × sources × bins) rows,
  * never documents.
  */
object DriftStream {

  /** File-source document stream (CorpusStream's schema). */
  def readDocStream(spark: SparkSession, landingDir: String): DataFrame =
    CorpusStream.readDocStream(spark, landingDir)

  /** Idempotent delta write — Corpus.driftCells verbatim, so the fold
    * can never diverge from batch q126's projection. Exposed for the
    * spec's replay pin.
    */
  def writeDelta(batch: DataFrame, deltaDir: String, batchId: Long): Unit =
    Corpus.driftCells(batch).coalesce(1)
      .write.mode("overwrite").parquet(s"$deltaDir/batch_id=$batchId")

  /** Cell-maintenance sink: per micro-batch, one histogram aggregate
    * into this batch's delta partition.
    */
  def cellSink(stream: DataFrame, deltaDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .queryName("drift_cell_maintenance")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, deltaDir, batchId)
        ()
      }
      .start()

  /** The whole-corpus cell table off the delta store alone. */
  def cellsFromDeltas(spark: SparkSession, deltaDir: String): DataFrame =
    spark.read.parquet(deltaDir)
      .groupBy("source", "bin")
      .agg(sum(col("o")).cast("long").as("o"))

  /** q126's drift report served off the maintained artifact — the SAME
    * χ² kernel (Corpus.chi2FromCells), so after streaming a corpus the
    * served statistics equal the in-query ones bit-for-bit
    * (StreamingSpec-pinned).
    */
  def driftFromDeltas(spark: SparkSession, deltaDir: String): DataFrame =
    Corpus.chi2FromCells(cellsFromDeltas(spark, deltaDir))
}
