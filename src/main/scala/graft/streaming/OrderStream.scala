package graft.streaming

import graft.ops.Mining
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming curriculum-plan maintenance — q151's (phase, shard) cells
  * kept current as document deltas land, the training-order twin of the
  * shard-manifest fold (ShardStream): phase (classifier score band) and
  * shard (seeded hash) are pure per-row functions, so each micro-batch
  * contributes a ≤ phases × shards PARTIAL cell table, and the served
  * manifest is the associative SUM-fold over the delta store plus the
  * (driver-side, bounded) exclusive offset pass — no document rescans at
  * serving time, ever. The position RANKS themselves (q150's gpos) are
  * per-epoch recomputes by design (a new seed each epoch); what the
  * store maintains is the block structure those ranks slot into.
  *
  * SUM cells are not idempotent under re-delivery, so the sink
  * OVERWRITES a per-batchId delta partition (the ShardStream /
  * EmbeddingStream discipline): a replayed foreachBatch rewrites the
  * identical directory and the served manifest is unchanged.
  */
object OrderStream {

  /** File-source document stream (CorpusStream's schema). */
  def readDocStream(spark: SparkSession, landingDir: String): DataFrame =
    CorpusStream.readDocStream(spark, landingDir)

  /** One micro-batch's partial cells — Mining.curriculumCells verbatim,
    * so the streaming fold can never phase a doc differently from batch
    * q151. ≤ phases × EpochShards rows per batch.
    */
  def batchCells(batch: DataFrame): DataFrame =
    Mining.curriculumCells(batch)

  /** Idempotent delta write: OVERWRITE this batch's partition directory.
    * Exposed for the spec's replay pin.
    */
  def writeDelta(batch: DataFrame, deltaDir: String, batchId: Long): Unit =
    batchCells(batch).coalesce(1)
      .write.mode("overwrite").parquet(s"$deltaDir/batch_id=$batchId")

  /** Cell-maintenance sink: per micro-batch, write the partial cells to
    * their batch_id partition. Trigger.AvailableNow + checkpoint as in
    * the corpus/shard/drift twins.
    */
  def cellSink(stream: DataFrame, deltaDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .queryName("curriculum_cell_maintenance")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, deltaDir, batchId)
        ()
      }
      .start()

  /** Serve the curriculum plan manifest off the delta store alone:
    * curriculumManifest already re-folds its input, so the per-batch
    * partials sum losslessly. Equals batch q151 over the union of all
    * landed documents (StreamingSpec-pinned), with zero document scans.
    */
  def manifestFromDeltas(spark: SparkSession, deltaDir: String): DataFrame =
    Mining.curriculumManifest(
      spark.read.parquet(deltaDir)
        .select("phase", "shard", "n_docs", "n_tokens"))

  /** Delta-store retention: fold partitions `batch_id <= upto` into the
    * base partition with the same SUM algebra serving applies — served
    * manifest bit-identical before and after (StreamingSpec-pinned).
    */
  def compactDeltas(spark: SparkSession, deltaDir: String, upto: Long): Unit =
    StoreCompaction.foldInto(spark, deltaDir, upto) { cells =>
      cells.groupBy("phase", "shard")
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_tokens")).cast("long").as("n_tokens"))
    }
}
