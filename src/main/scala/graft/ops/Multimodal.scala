package graft.ops

import graft.Catalog
import graft.queries.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched partition-wise decode, and stubbed feature
  * extraction.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side contract is
  * real: binary column + metadata struct schema, a `mapPartitions`
  * batch-decode (the Scala analog of `mapInPandas` — per-partition
  * batching so a real decoder would amortize model/codec init across a
  * batch, exactly how a GPU decode stage is driven), and fixed-width
  * feature output. Swapping `decodeStub` for a JNI/codec call changes no
  * plan shape.
  *
  * The stub derives every pseudo-feature from the md5 hex digest of the
  * payload bytes, which a DuckDB oracle reproduces from md5(text) — so
  * even the stubbed path is hash-checked end to end.
  */
object Multimodal {

  /** Asset row: payload + typed metadata (the schema a 100 TB multimodal
    * lakehouse table would carry; payload stays opaque bytes end-to-end).
    */
  case class Asset(doc_id: Long, mime: String, payload: Array[Byte])

  /** Extracted features — fixed-width record per asset. */
  case class AssetFeatures(
      doc_id: Long,
      byte_len: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  private val hexDigits = "0123456789abcdef".toCharArray

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec (???-equivalent; the container ships no codecs). Derives
    * pseudo-dimensions and an 8-float "embedding" from the md5 of the
    * bytes: checksum = h60 (first 15 hex chars), width/height/n_frames
    * from 16-bit hex windows, feature[k] = hex[4k..4k+4) / 65536 (exact
    * in float32, so the oracle's double arithmetic matches bit-for-bit).
    */
  def decodeStub(a: Asset): AssetFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(a.payload)
    val hex = {
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < 16) {
        sb.append(hexDigits((d(i) >> 4) & 0xf)).append(hexDigits(d(i) & 0xf))
        i += 1
      }
      sb.toString
    }
    def h16(off: Int): Int = Integer.parseInt(hex.substring(off, off + 4), 16)
    val checksum = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    AssetFeatures(a.doc_id, a.payload.length, checksum,
      width = h16(0) % 640 + 1,
      height = h16(4) % 480 + 1,
      n_frames = h16(8) % 32 + 1,
      feature = Array.tabulate(8)(k => h16(k * 4) / 65536.0f))
  }

  /** Documents rendered as a multimodal asset table: binary payload
    * (UTF-8 bytes stand in for media bytes) + metadata struct.
    */
  def assetTable(spark: SparkSession, dir: String): DataFrame =
    Catalog.table(spark, dir, "documents").select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source"), col("lang"), col("n_chars")).as("meta"))

  /** Batched partition-wise decode — the mapInPandas-shaped stage.
    * Batching is explicit (`grouped(batchSize)`) so decoder init cost is
    * amortized per batch, and partition count controls decode parallelism.
    */
  def decodeFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("mime"), col("payload")).as[Asset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real codec would init once here, decode the batch, release
          batch.map(decodeStub)
        }
      }
      .toDF()
  }

  /** Resize-to-fit + frame-sampling plan columns (pure arithmetic on the
    * decoded metadata — the stage a real pipeline runs between decode and
    * feature extraction): scale the longer edge down to `box` (never up),
    * sample at most `maxFrames` frames at a regular stride.
    */
  def withResizeAndSampling(
      decoded: org.apache.spark.sql.DataFrame,
      box: Int = 224,
      maxFrames: Int = 8): org.apache.spark.sql.DataFrame = {
    val scale = least(lit(1.0),
      lit(box.toDouble) / greatest(col("width"), col("height")).cast("double"))
    val stride = ceil(col("n_frames") / lit(maxFrames.toDouble)).cast("int")
    decoded
      .withColumn("resized_w",
        greatest(lit(1L), floor(col("width") * scale)).cast("int"))
      .withColumn("resized_h",
        greatest(lit(1L), floor(col("height") * scale)).cast("int"))
      .withColumn("frame_stride", stride)
      .withColumn("n_sampled",
        ceil(col("n_frames").cast("double") / stride).cast("int"))
  }

  private val q37OracleSql =
    """WITH d AS (
      |  SELECT doc_id, 'text/plain' AS mime, source,
      |    CAST(strlen(text) AS INTEGER) AS byte_len,
      |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS checksum,
      |    CAST(CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 640 + 1 AS INTEGER) AS width,
      |    CAST(CAST('0x' || substr(md5(text), 5, 4) AS BIGINT) % 480 + 1 AS INTEGER) AS height,
      |    CAST(CAST('0x' || substr(md5(text), 9, 4) AS BIGINT) % 32 + 1 AS INTEGER) AS n_frames,
      |    CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) / 65536.0 AS feat_0
      |  FROM documents
      |)
      |SELECT doc_id, mime, source, byte_len, checksum, width, height, n_frames, feat_0,
      |  CAST(GREATEST(1, FLOOR(width * LEAST(1.0, 224.0 / GREATEST(width, height)))) AS INTEGER) AS resized_w,
      |  CAST(GREATEST(1, FLOOR(height * LEAST(1.0, 224.0 / GREATEST(width, height)))) AS INTEGER) AS resized_h,
      |  CAST(CEIL(n_frames / 8.0) AS INTEGER) AS frame_stride,
      |  CAST(CEIL(CAST(n_frames AS DOUBLE) / CAST(CEIL(n_frames / 8.0) AS INTEGER)) AS INTEGER) AS n_sampled
      |FROM d
      |ORDER BY doc_id""".stripMargin

  /** q37 — multimodal pipeline: asset table → batched stub decode →
    * resize-to-fit + frame-sampling plan → joined back to metadata.
    * Oracle: the md5-derived stub and the resize/sample arithmetic
    * recomputed in DuckDB from the same bytes.
    */
  val q37 = Q("q37_multimodal_decode", q37OracleSql) { (s, dir) =>
    val assets = assetTable(s, dir)
    withResizeAndSampling(decodeFeatures(assets))
      .join(assets.select(col("doc_id"), col("mime"), col("meta.source").as("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("mime"), col("source"), col("byte_len"),
        col("checksum"), col("width"), col("height"), col("n_frames"),
        element_at(col("feature"), 1).cast("double").as("feat_0"),
        col("resized_w"), col("resized_h"), col("frame_stride"), col("n_sampled"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q37)
}
