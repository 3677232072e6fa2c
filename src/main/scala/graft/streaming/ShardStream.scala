package graft.streaming

import graft.ops.Mining
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming shard-manifest maintenance — q123's fixed hash-range
  * manifest kept current as document deltas land, the reshard twin of
  * the sketch-artifact discipline (SketchStream): shard assignment is a
  * pure per-row function of the content hash, and every manifest column
  * is an associative-commutative fold (counts/sums add, XOR combines,
  * min/max compose), so per-micro-batch PARTIAL manifests are all the
  * state the stream needs. q119's exactly-size-bounded layout cannot be
  * maintained this way — its prefix-sum boundaries move when a document
  * lands between existing keys — which is exactly why q123 trades cut
  * precision for fold algebra.
  *
  * Unlike the register folds (max-merge, idempotent under re-delivery by
  * algebra), XOR and SUM are NOT idempotent — re-folding the same batch
  * would corrupt the checksum and double the counts. The sink therefore
  * OVERWRITES a per-batchId delta partition (the EmbeddingStream
  * discipline): a replayed foreachBatch rewrites the identical directory
  * and the served manifest is unchanged — idempotent end-to-end without
  * relying on the checkpoint alone. Serving aggregates the delta store:
  * O(batches × shards) rows, shard-count-bounded per batch, never
  * document-sized.
  */
object ShardStream {

  /** File-source document stream (CorpusStream's schema). */
  def readDocStream(spark: SparkSession, landingDir: String): DataFrame =
    CorpusStream.readDocStream(spark, landingDir)

  /** One micro-batch's partial manifest — Mining.shardStats +
    * shardManifest verbatim, so the streaming fold can never diverge
    * from the batch query. ≤ ShardCount rows per batch.
    */
  def batchDelta(batch: DataFrame): DataFrame =
    Mining.shardManifest(Mining.shardStats(batch))

  /** Idempotent delta write: OVERWRITE this batch's partition directory.
    * Exposed for the spec's replay pin (writing the same delta twice is
    * a no-op for the served manifest).
    */
  def writeDelta(batch: DataFrame, deltaDir: String, batchId: Long): Unit = {
    StoreCompaction.writeEvolvedDelta(batchDelta(batch), deltaDir, batchId)
  }

  /** Manifest-maintenance sink: per micro-batch, write the partial
    * manifest to its batch_id partition. Trigger.AvailableNow +
    * checkpoint as in the corpus/embedding/sketch twins.
    */
  def manifestSink(stream: DataFrame, deltaDir: String,
      checkpointDir: String,
      maintain: Option[StoreCompaction.MaintenancePolicy] = None): StreamingQuery =
    stream.writeStream
      .queryName("shard_manifest_maintenance")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeDelta(batch, deltaDir, batchId)
        StoreCompaction.sinkMaintain(batch.sparkSession,
          Seq(deltaDir -> Seq("shard_id")), maintain)
      }
      .start()

  /** Serve the whole-corpus manifest off the delta store alone: fold the
    * per-batch partials with the same associative algebra — no document
    * rescans at serving time. Equals batch q123 over the union of all
    * landed documents (StreamingSpec-pinned).
    */
  def manifestFromDeltas(spark: SparkSession, deltaDir: String): DataFrame =
    foldManifest(spark.read.parquet(deltaDir)).orderBy("shard_id")

  /** The shard manifest over a retention WINDOW [lo, upto] — the same
    * associative fold over exactly the retained landings' partials: the
    * manifest of the documents still on disk.
    */
  def manifestWindowed(spark: SparkSession, deltaDir: String, lo: Long,
      upto: Long = Long.MaxValue): DataFrame =
    foldManifest(StoreCompaction.readWindow(spark, deltaDir, lo, upto))
      .orderBy("shard_id")

  private def foldManifest(deltas: DataFrame): DataFrame =
    deltas
      .groupBy(col("shard_id"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("shard_tokens")).cast("long").as("shard_tokens"),
        expr("bit_xor(checksum)").as("checksum"),
        min(col("min_doc_id")).as("min_doc_id"),
        max(col("max_doc_id")).as("max_doc_id"))

  /** Delta-store retention: fold partitions `batch_id <= upto` into the
    * base partition using the SAME associative manifest algebra serving
    * applies — sums, XOR, min/max all reassociate exactly, so the served
    * manifest is bit-identical before and after compaction
    * (StreamingSpec-pinned). The store then holds ≤ ShardCount base rows
    * plus one small partition per recent batch instead of one per batch
    * ever ingested.
    */
  def compactDeltas(spark: SparkSession, deltaDir: String, upto: Long): Unit =
    StoreCompaction.foldInto(spark, deltaDir, upto)(foldManifest)
}
