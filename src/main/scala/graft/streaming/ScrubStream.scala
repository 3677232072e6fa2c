package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming decontamination — q137's surgical span scrub run per
  * micro-batch against a MATERIALIZED benchmark shingle artifact, the
  * missing streamed twin of the scrub family (q136/q137/q139 rebuild the
  * benchmark hash set from raw benchmark text every run; a pipeline
  * scrubs arriving documents against a FROZEN benchmark release).
  *
  * Artifact discipline: the benchmark set is a content-addressed parquet
  * of distinct h60 shingle hashes with a commit marker (the curation-
  * store pattern) — small by nature (a benchmark suite, not a corpus),
  * so every micro-batch broadcasts it; rebuilding it is only ever
  * triggered by a new benchmark release, never by corpus growth.
  *
  * Sink discipline: scrub verdicts are pure per-row functions of
  * (document, artifact), so the stream needs NO state store — but
  * re-delivered FILES would duplicate rows, so each batch drops doc_ids
  * already in the store (first-seen wins; verdicts are deterministic, so
  * first-seen ≡ any-seen) and OVERWRITES its per-batchId partition
  * (crash-replay rewrites the identical directory). Per-batch cost: the
  * store is probed with the batch's ids via broadcast semi-join — the
  * store is scanned, never shuffled (the CorpusStream fp-probe law).
  */
object ScrubStream {

  /** File-source document stream (CorpusStream's schema). */
  def readDocStream(spark: SparkSession, landingDir: String): DataFrame =
    CorpusStream.readDocStream(spark, landingDir)

  /** Where the benchmark shingle artifact for a corpus dir lives —
    * content-addressed by documents.parquet identity (regenerated corpus
    * → regenerated benchmark slice → new artifact).
    */
  def benchArtifactPath(dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_bench_shingles_v1_$key"
  }

  /** Build (or reuse) the benchmark shingle artifact: the distinct h60
    * set of the benchmark slice (doc_id < 50), marker-committed.
    */
  def buildBenchArtifact(s: SparkSession, dir: String): String = {
    val root = benchArtifactPath(dir)
    val marker = new java.io.File(root, "_ARTIFACT_COMMITTED")
    if (!marker.exists()) {
      val bench = graft.Catalog.table(s, dir, "documents")
        .filter(col("doc_id") < 50).select(col("doc_id"), col("text"))
      Dedup.benchShingleHashes(bench)
        .write.mode("overwrite").parquet(s"$root/hashes")
      marker.createNewFile()
    }
    root
  }

  /** One micro-batch's scrub rows — `Dedup.scrubSpansByHashes` verbatim
    * (the batch q137 kernel against the artifact's hash set), with the
    * batch's source column riding along for the store-served report.
    */
  def batchScrub(batch: DataFrame, benchHashes: DataFrame): DataFrame =
    Dedup.scrubSpansByHashes(batch.select(col("doc_id"), col("text")), benchHashes)
      .join(batch.select(col("doc_id"), col("source")), Seq("doc_id"))

  /** Scrub sink: drop already-scrubbed doc_ids (first-seen wins —
    * verdicts are deterministic so re-delivery is a no-op), scrub the
    * rest against the artifact, overwrite the per-batchId partition.
    */
  def scrubSink(stream: DataFrame, benchArtifactRoot: String, storeDir: String,
      checkpointDir: String, indexDir: Option[String] = None): StreamingQuery =
    stream.writeStream
      .queryName("scrub_stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val store = new java.io.File(storeDir)
        val hasHistory = store.exists() && store.listFiles() != null &&
          store.listFiles().exists(f =>
            f.isDirectory && f.getName.startsWith("batch_id="))
        val fresh =
          if (hasHistory) {
            val known = spark.read.parquet(storeDir)
              .filter(col("batch_id") < batchId).select("doc_id")
              .join(broadcast(batch.select("doc_id")), Seq("doc_id"), "left_semi")
            batch.join(broadcast(known), Seq("doc_id"), "left_anti")
          } else batch
        // the batch is unrolled into positional shingles once anyway —
        // materialize one localCheckpoint so the verdict write and the
        // index delta don't re-tokenize
        val freshMat = fresh.localCheckpoint()
        val bench = spark.read.parquet(s"$benchArtifactRoot/hashes")
        batchScrub(freshMat, bench)
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
        // maintain the inverted shingle index alongside the verdicts:
        // per-batch (h, doc_id) delta partitions, overwrite-idempotent
        // like the store itself. Docs are first-seen-unique across
        // batches, so the union of deltas IS the distinct corpus index
        // and rotation reads it via partition discovery.
        indexDir.foreach { idx =>
          Dedup.positionalShingles(freshMat.select(col("doc_id"), col("text")))
            .select(col("h"), col("doc_id")).distinct()
            .write.mode("overwrite").parquet(s"$idx/batch_id=$batchId")
        }
        ()
      }
      .start()

  /** Where the batch-built scrub store for a corpus dir lives. */
  def scrubStorePath(dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_scrub_store_v1_$key"
  }

  /** Build the scrub store for a corpus dir by running the sink's batch
    * path over the whole corpus slice as one batch — the same code every
    * micro-batch runs, so the store IS the streaming sink's output
    * shape. Marker-committed; returns the store root.
    */
  def buildScrubStore(s: SparkSession, dir: String): String = {
    val root = scrubStorePath(dir)
    val marker = new java.io.File(root, "_STORE_COMMITTED")
    if (!marker.exists()) {
      val benchRoot = buildBenchArtifact(s, dir)
      val corpus = graft.Catalog.table(s, dir, "documents")
        .filter(col("doc_id") >= 50)
        .select(col("doc_id"), col("text"), col("source"))
      val bench = s.read.parquet(s"$benchRoot/hashes")
      batchScrub(corpus, bench)
        .write.mode("overwrite").parquet(s"$root/rows/batch_id=0")
      marker.createNewFile()
    }
    root
  }

  /** Where the inverted (h, doc_id) shingle index for a corpus lives. */
  def shingleIndexPath(dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_shingle_index_v1_$key"
  }

  /** Build (or reuse) the inverted shingle index: DISTINCT (h, doc_id)
    * pairs over the corpus's positional 3-shingles. Built once per
    * corpus and amortized across every benchmark-release rotation —
    * touched-doc detection becomes a broadcast join of the (tiny) hash
    * delta against this index, with no corpus text unroll at all.
    */
  def buildShingleIndex(s: SparkSession, dir: String): String = {
    val root = shingleIndexPath(dir)
    val marker = new java.io.File(root, "_INDEX_COMMITTED")
    if (!marker.exists()) {
      val corpus = graft.Catalog.table(s, dir, "documents")
        .filter(col("doc_id") >= 50).select(col("doc_id"), col("text"))
      Dedup.positionalShingles(corpus).select(col("h"), col("doc_id")).distinct()
        .write.mode("overwrite").parquet(s"$root/pairs")
      marker.createNewFile()
    }
    root
  }

  /** One micro-batch's inverted-index delta: the corpus slice's
    * (doc_id ≥ 50, the batch-build's convention) DISTINCT positional-
    * shingle (h, doc_id) pairs. The index is ADD-ONLY state — a new doc
    * contributes only its own rows and never modifies another's — so a
    * per-batchId OVERWRITE partition is the whole replay story and the
    * "fold" is a plain union. Containment (q185) served off the deltas
    * is therefore exact over whatever has landed, with zero rebuilds.
    */
  def writeShingleDelta(batch: DataFrame, deltaDir: String, batchId: Long): Unit =
    Dedup.positionalShingles(
        batch.filter(col("doc_id") >= 50).select(col("doc_id"), col("text")))
      .select(col("h"), col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$deltaDir/batch_id=$batchId")

  /** Inverted-index maintenance sink — q185's serving artifact kept
    * current as documents land.
    */
  def shingleIndexSink(stream: DataFrame, deltaDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .queryName("shingle_index_maintenance")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeShingleDelta(batch, deltaDir, batchId)
        ()
      }
      .start()

  /** q185's containment table off the index deltas alone — bit-equal to
    * the batch query over the union of landings (StreamingSpec-pinned).
    * `spine` is the (doc_id)-bearing frame of the docs to report on.
    * `upto` pins a RELEASE (only batches ≤ upto fold), so one store
    * serves containment AS OF any earlier landing — the LM/diversity
    * stores' pin mechanism applied to the dedup surface (q198 rides it).
    */
  def containmentFromDeltas(spark: SparkSession, deltaDir: String,
      spine: DataFrame, upto: Long = Long.MaxValue): DataFrame =
    Dedup.containmentBest(
      Dedup.jaccardPairsFromExploded(
        spark.read.parquet(deltaDir)
          .filter(col("batch_id") <= upto ||
            col("batch_id") === StoreCompaction.BasePartition)
          .select("doc_id", "h")),
      spine)

  /** Where the release-DELTA-structured shingle-index store for a corpus
    * lives (two committed partitions: batch 0 = the first release's
    * corpus half, batch 1 = the rest — q183's max/2 release convention).
    */
  def shingleDeltaStorePath(dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}:deltas".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_shingle_deltas_v1_$key"
  }

  /** Build (or reuse) the release-delta shingle-index store: the corpus
    * split at the q183 release boundary (max doc_id / 2), each half one
    * per-batchId partition — exactly what `shingleIndexSink` would have
    * produced had the two releases landed as separate micro-batches.
    */
  def buildShingleDeltaStore(s: SparkSession, dir: String): (String, Long) = {
    val d = graft.Catalog.table(s, dir, "documents")
    val cut = d.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0) / 2
    val root = shingleDeltaStorePath(dir)
    val marker = new java.io.File(root, "_STORE_COMMITTED")
    if (!marker.exists()) {
      writeShingleDelta(d.filter(col("doc_id") < cut), s"$root/deltas", 0L)
      writeShingleDelta(d.filter(col("doc_id") >= cut), s"$root/deltas", 1L)
      marker.createNewFile()
    }
    (s"$root/deltas", cut)
  }

  /** Where a RELEASE-keyed scrub store lives: corpus identity × the
    * benchmark release's id bound — each benchmark release gets its own
    * frozen verdict store.
    */
  def releaseScrubStorePath(dir: String, benchMaxId: Long): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}:r$benchMaxId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_scrub_release_v1_$key"
  }

  /** Build a release's scrub store. With `prev` (an earlier release's
    * committed store and its id bound), the build is INCREMENTAL —
    * `Dedup.incrementalRescrub` re-scrubs only the docs the release
    * delta touches and carries every other row over from the previous
    * store verbatim, so rotating a benchmark release costs delta hit
    * density, not a corpus re-scan. Without `prev`, a full scrub.
    */
  def buildReleaseScrubStore(s: SparkSession, dir: String, benchMaxId: Long,
      prev: Option[(String, Long)] = None): String = {
    val root = releaseScrubStorePath(dir, benchMaxId)
    val marker = new java.io.File(root, "_STORE_COMMITTED")
    if (!marker.exists()) {
      val d = graft.Catalog.table(s, dir, "documents")
      val corpus = d.filter(col("doc_id") >= 50)
        .select(col("doc_id"), col("text"), col("source"))
      val h2 = Dedup.benchShingleHashes(
        d.filter(col("doc_id") < benchMaxId).select(col("doc_id"), col("text")))
        .localCheckpoint()
      val rows = prev match {
        case Some((prevRoot, prevMaxId)) =>
          val h1 = Dedup.benchShingleHashes(
            d.filter(col("doc_id") < prevMaxId).select(col("doc_id"), col("text")))
            .localCheckpoint()
          val v1 = s.read.parquet(s"$prevRoot/rows")
          val index = s.read.parquet(s"${buildShingleIndex(s, dir)}/pairs")
          Dedup.incrementalRescrubIndexed(
              corpus.select(col("doc_id"), col("text")),
              v1.drop("source", "batch_id"), index, h1, h2)
            .join(corpus.select(col("doc_id"), col("source")), Seq("doc_id"))
        case None =>
          batchScrub(corpus, h2)
      }
      rows.write.mode("overwrite").parquet(s"$root/rows/batch_id=0")
      marker.createNewFile()
    }
    root
  }
}
