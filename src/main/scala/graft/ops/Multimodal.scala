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

  /** STUB decoder — deterministic fake standing in for an image/audio
    * codec (???-equivalent; the container ships no codecs). Derives
    * pseudo-dimensions and an 8-float "embedding" from the bytes.
    */
  def decodeStub(a: Asset): AssetFeatures = {
    var h = 1125899906842597L
    var i = 0
    while (i < a.payload.length) { h = h * 31L + (a.payload(i) & 0xff); i += 1 }
    val feat = Array.tabulate(8) { k =>
      val x = h * (k * 2 + 1)
      ((x % 1000L).toFloat) / 1000.0f
    }
    AssetFeatures(a.doc_id, a.payload.length, h,
      width = (math.floorMod(h, 640L) + 1).toInt,
      height = (math.floorMod(h >> 16, 480L) + 1).toInt,
      n_frames = (math.floorMod(h >> 32, 32L) + 1).toInt,
      feature = feat)
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

  /** q37 — multimodal decode pipeline: asset table → batched stub decode →
    * per-asset features joined back to metadata. No SQL oracle (the stub
    * hash isn't ANSI-expressible); MultimodalSpec pins golden values and
    * schema.
    */
  val q37 = Q.noOracle("q37_multimodal_decode") { (s, dir) =>
    val assets = assetTable(s, dir)
    decodeFeatures(assets)
      .join(assets.select(col("doc_id"), col("mime"), col("meta.source").as("source")),
        Seq("doc_id"))
      .select(col("doc_id"), col("mime"), col("source"), col("byte_len"),
        col("checksum"), col("width"), col("height"), col("n_frames"),
        element_at(col("feature"), 1).as("feat_0"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q37)
}
