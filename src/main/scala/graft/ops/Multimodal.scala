package graft.ops

import graft.Catalog
import graft.queries.{Det, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, batched partition-wise decode, and per-format feature
  * extraction.
  *
  * Four formats decode for REAL with zero added dependencies — BMP and
  * WAV/PCM by hand-written fixed-layout parsers, JPEG and PNG through
  * the JDK's own `javax.imageio` readers — each reporting the same
  * fixed-width statistics record. Only mp3/video (no decoder anywhere in
  * the bare JVM) fall back to a clearly-marked deterministic STUB. The
  * Spark-side contract is uniform across all of them: binary column +
  * metadata struct schema, a `mapPartitions` batch-decode (the Scala
  * analog of `mapInPandas` — per-partition batching so decoder init
  * amortizes across a batch, exactly how a GPU decode stage is driven),
  * and fixed-width feature output. Swapping any codec for a JNI call
  * changes no plan shape.
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

  /** A decoder for one asset family. Implementations must be pure
    * functions of the payload bytes (decode(a) is called from executor
    * tasks, once per asset, after per-batch `init()`), and must THROW on
    * malformed payloads — the caller maps failures to a null-feature row
    * rather than killing the task, mirroring how a production decode
    * stage quarantines corrupt media instead of failing the job.
    */
  trait Codec extends Serializable {
    /** Amortized once per batch (model load / codec context). */
    def init(): Unit = ()
    def decode(a: Asset): AssetFeatures
  }

  /** MIME-type dispatch table: real decoders for the four formats the
    * bare JVM can parse — BMP and WAV/PCM by hand (fixed-width layouts),
    * JPEG and PNG through the JDK's own `javax.imageio` readers
    * (java.desktop ships them; no codec jars, headless-safe). mp3/video
    * stay on the md5 stub — the one seam the container genuinely cannot
    * decode — clearly marked.
    */
  def codecFor(mime: String): Codec = mime match {
    case "image/bmp" => BmpCodec
    case "image/jpeg" | "image/jpg" => JpegCodec
    case "image/png" => PngCodec
    case "image/gif" => GifCodec
    case "audio/wav" | "audio/x-wav" => WavCodec
    case "audio/aiff" | "audio/x-aiff" | "audio/basic" => AiffAuCodec
    case _ => Md5StubCodec
  }

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

  object Md5StubCodec extends Codec {
    def decode(a: Asset): AssetFeatures = decodeStub(a)
  }

  /** Real BMP decoder — pure JVM, no codec jars. Parses the classic
    * Windows BITMAPFILEHEADER + BITMAPINFOHEADER (uncompressed 24/32-bit;
    * the format every `mspaint`/PIL `save(format='BMP')` emits): 'BM'
    * magic, pixel-array offset at byte 10, header size ≥ 40 at byte 14,
    * width/height as signed LE int32 at 18/22 (negative height = top-down
    * row order — accepted, |height| used), bpp at 28, compression 0 (BI_RGB)
    * at 30. Rows are padded to 4-byte boundaries. Features are real image
    * statistics in [0,1]: mean B, G, R, mean luma, min luma, max luma,
    * mean |∂luma/∂x| (horizontal edge energy), fraction of pixels brighter
    * than 0.5 — the kind of cheap quality signals a pretraining image
    * filter computes before any model sees the pixels.
    */
  object BmpCodec extends Codec {
    def decode(a: Asset): AssetFeatures = {
      val b = a.payload
      require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte, "not a BMP")
      def i32(off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      def i16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      val pixelOff = i32(10)
      val hdrSize = i32(14)
      val width = i32(18)
      val rawHeight = i32(22)
      val height = math.abs(rawHeight)
      val bpp = i16(28)
      val compression = if (hdrSize >= 20) i32(30) else 0
      require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
      require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
      require(bpp == 24 || bpp == 32, s"unsupported bpp $bpp (only 24/32-bit BI_RGB)")
      require(compression == 0, s"unsupported compression $compression")
      val bytesPerPx = bpp / 8
      val rowStride = ((width * bytesPerPx + 3) / 4) * 4
      require(b.length >= pixelOff + rowStride.toLong * height, "truncated pixel array")
      var sumB, sumG, sumR, sumLuma, sumEdge = 0.0
      var minLuma = Double.MaxValue
      var maxLuma = Double.MinValue
      var nBright = 0L
      var y = 0
      while (y < height) {
        val row = pixelOff + y * rowStride
        var x = 0
        var prevLuma = 0.0
        while (x < width) {
          val p = row + x * bytesPerPx
          val blue = (b(p) & 0xff) / 255.0
          val green = (b(p + 1) & 0xff) / 255.0
          val red = (b(p + 2) & 0xff) / 255.0
          val luma = 0.2126 * red + 0.7152 * green + 0.0722 * blue
          sumB += blue; sumG += green; sumR += red; sumLuma += luma
          if (luma < minLuma) minLuma = luma
          if (luma > maxLuma) maxLuma = luma
          if (luma > 0.5) nBright += 1
          if (x > 0) sumEdge += math.abs(luma - prevLuma)
          prevLuma = luma
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      val nEdges = math.max(1L, (width - 1).toLong * height)
      val crc = new java.util.zip.CRC32
      crc.update(b, 0, b.length)
      AssetFeatures(a.doc_id, b.length, crc.getValue, width, height, n_frames = 1,
        feature = Array(
          (sumB / n).toFloat, (sumG / n).toFloat, (sumR / n).toFloat,
          (sumLuma / n).toFloat, minLuma.toFloat, maxLuma.toFloat,
          (sumEdge / nEdges).toFloat, nBright.toFloat / n))
    }
  }

  /** The SAME 8-statistic battery BmpCodec computes from raw bytes,
    * evaluated over any decoded raster (row-major top-down; BMP's
    * bottom-up storage only reorders commutative sums and per-row edge
    * terms, so the statistics agree to float precision on identical
    * pixels — OpsSpec pins PNG-vs-BMP equality on a shared image).
    */
  private def rasterFeatures(docId: Long, bytes: Array[Byte],
      img: java.awt.image.BufferedImage): AssetFeatures = {
    val width = img.getWidth
    val height = img.getHeight
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    var sumB, sumG, sumR, sumLuma, sumEdge = 0.0
    var minLuma = Double.MaxValue
    var maxLuma = Double.MinValue
    var nBright = 0L
    var y = 0
    while (y < height) {
      var x = 0
      var prevLuma = 0.0
      while (x < width) {
        val rgb = img.getRGB(x, y)
        val red = ((rgb >> 16) & 0xff) / 255.0
        val green = ((rgb >> 8) & 0xff) / 255.0
        val blue = (rgb & 0xff) / 255.0
        val luma = 0.2126 * red + 0.7152 * green + 0.0722 * blue
        sumB += blue; sumG += green; sumR += red; sumLuma += luma
        if (luma < minLuma) minLuma = luma
        if (luma > maxLuma) maxLuma = luma
        if (luma > 0.5) nBright += 1
        if (x > 0) sumEdge += math.abs(luma - prevLuma)
        prevLuma = luma
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    val nEdges = math.max(1L, (width - 1).toLong * height)
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 0, bytes.length)
    AssetFeatures(docId, bytes.length, crc.getValue, width, height, n_frames = 1,
      feature = Array(
        (sumB / n).toFloat, (sumG / n).toFloat, (sumR / n).toFloat,
        (sumLuma / n).toFloat, minLuma.toFloat, maxLuma.toFloat,
        (sumEdge / nEdges).toFloat, nBright.toFloat / n))
  }

  /** Real JPEG/PNG decode through the JDK's bundled `javax.imageio`
    * readers — an actual entropy-coded image decode on executor tasks
    * with zero added dependencies. `ImageIO.read` returns null (rather
    * than throwing) on an unrecognizable payload, so the null is turned
    * into the require-failure the quarantine path expects.
    */
  private def imageIoDecode(a: Asset): AssetFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.payload))
    require(img != null, s"undecodable ${a.mime} payload")
    rasterFeatures(a.doc_id, a.payload, img)
  }

  object JpegCodec extends Codec {
    def decode(a: Asset): AssetFeatures = imageIoDecode(a)
  }

  object PngCodec extends Codec {
    def decode(a: Asset): AssetFeatures = imageIoDecode(a)
  }

  /** How many frames a multi-frame asset's statistics sample. */
  val FrameSampleBudget = 8

  /** Real MULTI-frame decode — animated GIF through the JDK's ImageIO
    * reader. This is the video-shaped seam made real: `n_frames` is the
    * actual frame count, and the statistics battery runs over at most
    * [[FrameSampleBudget]] frames at a regular stride (exactly the
    * sampling plan `withResizeAndSampling` computes), averaging the
    * per-frame features — decode cost stays bounded per asset no matter
    * how long the animation is, the property a video decode stage needs.
    */
  object GifCodec extends Codec {
    def decode(a: Asset): AssetFeatures = {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      require(readers.hasNext, "no gif reader")
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        reader.setInput(iis, false)
        val nFrames = reader.getNumImages(true)
        require(nFrames > 0, "no frames in gif")
        val stride = math.max(1, math.ceil(nFrames.toDouble / FrameSampleBudget).toInt)
        val sampled = (0 until nFrames by stride).map(i =>
          rasterFeatures(a.doc_id, a.payload, reader.read(i)))
        val k = sampled.length
        val mean = Array.tabulate(8)(j => sampled.map(_.feature(j)).sum / k)
        // min/max luma compose across frames as min/max, not means
        mean(4) = sampled.map(_.feature(4)).min
        mean(5) = sampled.map(_.feature(5)).max
        sampled.head.copy(n_frames = nFrames, feature = mean)
      } finally {
        reader.dispose()
        iis.close()
      }
    }
  }

  /** Real WAV/PCM decoder — pure JVM RIFF parse: 'RIFF'…'WAVE' magic, then
    * chunk walk to 'fmt ' (PCM format 1 or IEEE-float 3, 8/16-bit int or
    * 32-bit float samples) and 'data'. Maps onto the fixed-width record
    * as: width = sample rate, height = channel count, n_frames = frames
    * (samples per channel). Features are the audio-quality battery a
    * speech-data filter runs: mean amplitude, RMS, peak, zero-crossing
    * rate, DC offset, dynamic range (peak−RMS), fraction of near-silent
    * frames (|s|<0.01), and clipping fraction (|s|>0.99) — all on samples
    * normalized to [−1,1], frame values averaged across channels.
    */
  object WavCodec extends Codec {
    def decode(a: Asset): AssetFeatures = {
      val b = a.payload
      require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
        && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a WAV")
      def i32(off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      def i16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      var off = 12
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val sz = i32(off + 4)
        require(sz >= 0, s"bad chunk size $sz")
        if (id == "fmt ") fmtOff = off + 8
        else if (id == "data") { dataOff = off + 8; dataLen = math.min(sz, b.length - dataOff) }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(fmtOff >= 0 && dataOff >= 0, "missing fmt/data chunk")
      val fmtTag = i16(fmtOff)
      val channels = i16(fmtOff + 2)
      val sampleRate = i32(fmtOff + 4)
      val bitsPerSample = i16(fmtOff + 14)
      require(channels > 0 && sampleRate > 0, "bad fmt chunk")
      require((fmtTag == 1 && (bitsPerSample == 8 || bitsPerSample == 16)) ||
        (fmtTag == 3 && bitsPerSample == 32),
        s"unsupported format tag=$fmtTag bits=$bitsPerSample")
      val bytesPerSample = bitsPerSample / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = dataLen / frameBytes
      val sampleAt: Int => Double = { f =>
        var c = 0
        var acc = 0.0
        while (c < channels) {
          val p = dataOff + f * frameBytes + c * bytesPerSample
          acc += (bitsPerSample match {
            case 8 => ((b(p) & 0xff) - 128) / 128.0 // 8-bit WAV is unsigned
            case 16 => ((b(p) & 0xff) | (b(p + 1) << 8)).toShort / 32768.0
            case 32 => java.lang.Float.intBitsToFloat(i32(p)).toDouble
          })
          c += 1
        }
        acc / channels
      }
      audioBattery(a.doc_id, b, sampleRate, channels, nFrames, sampleAt)
    }
  }

  /** The 8-statistic audio battery over channel-averaged frame samples —
    * shared verbatim by WavCodec's byte-level parse and AiffAuCodec's
    * AudioSystem-decoded stream, so every audio format reports
    * identically.
    */
  private def audioBattery(docId: Long, bytes: Array[Byte], sampleRate: Int,
      channels: Int, nFrames: Int, sampleAt: Int => Double): AssetFeatures = {
    // Int => Double is @specialized, so the per-sample call stays unboxed
    // — a long recording must not allocate per frame
    var sumAbs, sumSq, sumRaw = 0.0
    var peak = 0.0
    var nZeroCross, nSilent, nClipped = 0L
    var prevSign = 0
    var f = 0
    while (f < nFrames) {
      val s = sampleAt(f)
      val abs = math.abs(s)
      sumAbs += abs; sumSq += s * s; sumRaw += s
      if (abs > peak) peak = abs
      if (abs < 0.01) nSilent += 1
      if (abs > 0.99) nClipped += 1
      val sign = java.lang.Double.compare(s, 0.0)
      if (f > 0 && sign != 0 && prevSign != 0 && sign != prevSign) nZeroCross += 1
      if (sign != 0) prevSign = sign
      f += 1
    }
    val n = math.max(1L, f.toLong)
    val rms = math.sqrt(sumSq / n)
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 0, bytes.length)
    AssetFeatures(docId, bytes.length, crc.getValue,
      width = sampleRate, height = channels, n_frames = f,
      feature = Array(
        (sumAbs / n).toFloat, rms.toFloat, peak.toFloat,
        nZeroCross.toFloat / n, (sumRaw / n).toFloat,
        (peak - rms).toFloat, nSilent.toFloat / n, nClipped.toFloat / n))
  }

  /** Real AIFF/AU decode through the JDK's `javax.sound.sampled` —
    * the big-endian and μ-law families WavCodec's RIFF parser cannot
    * read, converted by AudioSystem to 16-bit signed little-endian PCM
    * and run through the SAME `audioBattery` (OpsSpec pins an AIFF of
    * WavCodec's golden samples to the identical statistics). Zero added
    * dependencies.
    */
  object AiffAuCodec extends Codec {
    def decode(a: Asset): AssetFeatures = {
      import javax.sound.sampled._
      val ais0 = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(a.payload))
      try {
        val src = ais0.getFormat
        val channels = src.getChannels
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, channels, 2 * channels, src.getSampleRate, false)
        val ais = AudioSystem.getAudioInputStream(target, ais0)
        val data = ais.readAllBytes()
        val frameBytes = 2 * channels
        val nFrames = data.length / frameBytes
        val sampleAt: Int => Double = { f =>
          var c = 0
          var acc = 0.0
          while (c < channels) {
            val p = f * frameBytes + c * 2
            acc += ((data(p) & 0xff) | (data(p + 1) << 8)).toShort / 32768.0
            c += 1
          }
          acc / channels
        }
        audioBattery(a.doc_id, a.payload, src.getSampleRate.toInt, channels, nFrames, sampleAt)
      } finally ais0.close()
    }
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
    * Codec is chosen per asset from its MIME type (`codecFor`); a payload
    * the codec rejects becomes a quarantine row (negative dimensions,
    * empty feature vector) instead of failing the task — corrupt media is
    * a certainty at 100 TB and one bad file must not kill a stage.
    */
  def decodeFeatures(assets: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("doc_id"), col("mime"), col("payload")).as[Asset]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one init per (batch, codec family) — where a real decoder
          // loads its codec context / model weights
          batch.iterator.map(a => codecFor(a.mime)).toSet.foreach((c: Codec) => c.init())
          batch.map { a =>
            try codecFor(a.mime).decode(a)
            catch { case scala.util.control.NonFatal(_) =>
              AssetFeatures(a.doc_id, a.payload.length, 0L, -1, -1, 0, Array.empty)
            }
          }
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

  // ── the stored-asset artifact: payloads as a real binary column ───────

  /** Where the materialized asset store for a source dir lives —
    * content-addressed by the documents table's path + mtime/size (the
    * `ivfIndexPath` convention) so a regenerated corpus invalidates the
    * payloads instead of silently reusing stale bytes.
    */
  def assetStorePath(dir: String): String = {
    val src = new java.io.File(dir, "documents.parquet")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir:${src.lastModified}:${src.length}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft_assets_v1_$key"
  }

  /** Materialize every fixture payload ONCE into a parquet asset table
    * (doc_id, mime, payload binary), partitioned by payload family
    * (`kind`) — after this build the multimodal queries read REAL stored
    * bytes off parquet pages (binary column pruning, partition-pruned
    * family scans, decode-off-storage), and the synth mapping survives
    * only here as the generator. Idempotent: `_SUCCESS`-gated like the
    * ANN index builds. Kinds: `bmp2x1`/`wav4` (the q154/q155 decode
    * batteries), `grid_bmp`/`wav64` (the dense q174/q176 dedup
    * fixtures), `grid_bmp_sparse`/`wav64_sparse` (q186's disjoint-family
    * cross-modal fixtures). At 100 TB this table IS the corpus — the
    * payloads arrive stored; everything downstream of this artifact is
    * exactly the production read path.
    */
  def buildAssetStore(s: SparkSession, dir: String): String = {
    val path = assetStorePath(dir)
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      import s.implicits._
      Catalog.table(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.flatMap { id =>
          Iterator(
            (id, "image/bmp", synthBmp2x1(id), "bmp2x1"),
            (id, "audio/wav", synthWav4(id), "wav4"),
            (id, "image/bmp", synthBmpGrid(id), "grid_bmp"),
            (id, "image/bmp", synthBmpGrid(sparseImgId(id)), "grid_bmp_sparse"),
            (id, "audio/wav", synthWav64(id), "wav64"),
            (id, "audio/wav", synthWav64(sparseAudId(id)), "wav64_sparse"))
        })
        .toDF("doc_id", "mime", "payload", "kind")
        .repartition(col("kind"))
        .write.partitionBy("kind").mode("overwrite").parquet(path)
    }
    path
  }

  /** One payload family of the asset store — the `kind` predicate is
    * partition pruning (one directory scanned, PlanSpec-pinned), and a
    * reader that doesn't select `payload` never touches the binary pages
    * (parquet column pruning — the property that makes metadata audits
    * over a 100 TB asset table cheap).
    */
  def assetStore(s: SparkSession, dir: String, kind: String): DataFrame =
    s.read.parquet(buildAssetStore(s, dir)).filter(col("kind") === kind)

  /** dHash signatures off STORED payloads — [[phashSigs]]' production
    * twin: same real BMP parse, but the bytes come from the asset
    * table's binary column instead of an in-task synthesizer.
    */
  private[graft] def phashSigsFromAssets(assets: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val (w, h, g) = parseBmpGray(b)
        (id, dhash60(w, h, g))
      })
      .toDF("doc_id", "phash")
  }

  /** Envelope codes off STORED payloads — [[audioCodes]]' production
    * twin over the asset table's binary column.
    */
  private[graft] def audioCodesFromAssets(assets: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => envCodeRow(id, parseWavPcm16(b)) })
      .toDF("doc_id", "code1", "code2", "env")
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

  /** A real 2×1 24-bit BMP whose six channel bytes come from the first
    * twelve hex chars of md5(doc_id) — a payload BOTH engines can reason
    * about: Spark parses it with the real [[BmpCodec]], DuckDB recomputes
    * the expected statistics from the same md5 arithmetic.
    */
  private[graft] def synthBmp2x1(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(id.toString.getBytes("UTF-8"))
    val buf = java.nio.ByteBuffer.allocate(62).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(54)
    buf.putInt(40).putInt(2).putInt(1).putShort(1).putShort(24)
    buf.putInt(0).putInt(8).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // one row: [b1 g1 r1 b2 g2 r2] + 2 pad — channel k = md5 byte k
    var k = 0
    while (k < 6) { buf.put(d(k)); k += 1 }
    buf.put(0.toByte).put(0.toByte)
    buf.array()
  }

  private val q154OracleSql: String = {
    // every literal double-cast (bare decimals are DECIMAL in DuckDB);
    // CAST(double AS REAL) rounds to nearest float32 — exactly the JVM's
    // .toFloat of the identical IEEE expression tree, so the comparison
    // is bit-exact with no tolerance
    def ch(i: Int) =
      s"CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), ${2 * i + 1}, 2) AS INT) / CAST(255.0 AS DOUBLE)"
    def luma(r: String, g: String, b: String) =
      s"CAST(0.2126 AS DOUBLE) * $r + CAST(0.7152 AS DOUBLE) * $g + CAST(0.0722 AS DOUBLE) * $b"
    s"""WITH px AS (
       |  SELECT doc_id,
       |    ${ch(0)} AS b1, ${ch(1)} AS g1, ${ch(2)} AS r1,
       |    ${ch(3)} AS b2, ${ch(4)} AS g2, ${ch(5)} AS r2
       |  FROM documents
       |), lum AS (
       |  SELECT *, ${luma("r1", "g1", "b1")} AS l1, ${luma("r2", "g2", "b2")} AS l2 FROM px
       |)
       |SELECT doc_id, 62 AS byte_len, 2 AS width, 1 AS height,
       |  CAST((b1 + b2) / CAST(2.0 AS DOUBLE) AS REAL) AS mean_b,
       |  CAST((g1 + g2) / CAST(2.0 AS DOUBLE) AS REAL) AS mean_g,
       |  CAST((r1 + r2) / CAST(2.0 AS DOUBLE) AS REAL) AS mean_r,
       |  CAST((l1 + l2) / CAST(2.0 AS DOUBLE) AS REAL) AS mean_luma,
       |  CAST(LEAST(l1, l2) AS REAL) AS min_luma,
       |  CAST(GREATEST(l1, l2) AS REAL) AS max_luma,
       |  CAST(ABS(l2 - l1) AS REAL) AS edge_energy,
       |  CAST((CASE WHEN l1 > CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN l2 > CAST(0.5 AS DOUBLE) THEN 1 ELSE 0 END) / CAST(2.0 AS DOUBLE) AS REAL) AS bright_frac
       |FROM lum ORDER BY doc_id""".stripMargin
  }

  /** q154 — the REAL image parse oracled end to end: a genuine BMP is
    * synthesized per document (pixels = md5 bytes), pushed through the
    * standard asset pipeline (`decodeFeatures` → [[BmpCodec]]'s actual
    * header/stride/pixel parse), and every emitted statistic is matched
    * bit-for-bit against DuckDB recomputing it from the same md5
    * arithmetic — q37 hash-checks the stub seam; this hash-checks a real
    * decoder. Float parity trick worth recording: both engines build the
    * identical IEEE DOUBLE tree, then Spark's `.toFloat` and DuckDB's
    * `CAST(… AS REAL)` perform the same round-to-nearest-even, so float
    * output columns compare exactly with zero tolerance.
    */
  val q154 = Q("q154_real_decode", q154OracleSql) { (s, dir) =>
    // bytes come from the STORED binary column (one pruned partition of
    // the asset table), not an in-task synthesizer — the production
    // decode-off-parquet path
    decodeFeatures(assetStore(s, dir, "bmp2x1"))
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        element_at(col("feature"), 1).as("mean_b"),
        element_at(col("feature"), 2).as("mean_g"),
        element_at(col("feature"), 3).as("mean_r"),
        element_at(col("feature"), 4).as("mean_luma"),
        element_at(col("feature"), 5).as("min_luma"),
        element_at(col("feature"), 6).as("max_luma"),
        element_at(col("feature"), 7).as("edge_energy"),
        element_at(col("feature"), 8).as("bright_frac"))
      .orderBy("doc_id")
  }

  /** A real 4-sample PCM16 mono WAV whose samples come from the first
    * sixteen hex chars of md5(doc_id) — the audio twin of
    * [[synthBmp2x1]]: v_k = hex[4k..4k+4) as uint16, sign-folded to
    * int16, written little-endian after a standard 44-byte RIFF header.
    */
  private[graft] def synthWav4(id: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"${b & 0xff}%02x").mkString
    val buf = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    buf.putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(8)
    var k = 0
    while (k < 4) {
      buf.putShort(Integer.parseInt(hex.substring(4 * k, 4 * k + 4), 16).toShort)
      k += 1
    }
    buf.array()
  }

  private val q155OracleSql: String = {
    // int16 sign fold + /32768 in DOUBLE, battery replicated in the
    // battery's own accumulation order; REAL casts at the end (the q154
    // float32 identity); sqrt is IEEE-exact so rms oracles too
    def sm(k: Int) =
      s"""(CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), ${4 * k + 1}, 4) AS INT) >= 32768
         |    THEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), ${4 * k + 1}, 4) AS INT) - 65536
         |    ELSE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), ${4 * k + 1}, 4) AS INT) END
         |  / CAST(32768.0 AS DOUBLE))""".stripMargin.replace("\n", " ")
    s"""WITH sm AS (
       |  SELECT doc_id, ${sm(0)} AS s1, ${sm(1)} AS s2, ${sm(2)} AS s3, ${sm(3)} AS s4
       |  FROM documents
       |), sg AS (
       |  SELECT *, CAST(SIGN(s1) AS INT) AS g1, CAST(SIGN(s2) AS INT) AS g2,
       |    CAST(SIGN(s3) AS INT) AS g3, CAST(SIGN(s4) AS INT) AS g4,
       |    ABS(s1) AS a1, ABS(s2) AS a2, ABS(s3) AS a3, ABS(s4) AS a4
       |  FROM sm
       |), pv AS (
       |  -- prevSign carries across zero samples exactly as the battery does
       |  SELECT *, CASE WHEN g2 <> 0 THEN g2 ELSE g1 END AS p2,
       |    CASE WHEN g3 <> 0 THEN g3 WHEN g2 <> 0 THEN g2 ELSE g1 END AS p3
       |  FROM sg
       |), zc AS (
       |  SELECT *,
       |    (CASE WHEN g2 <> 0 AND g1 <> 0 AND g2 <> g1 THEN 1 ELSE 0 END
       |   + CASE WHEN g3 <> 0 AND p2 <> 0 AND g3 <> p2 THEN 1 ELSE 0 END
       |   + CASE WHEN g4 <> 0 AND p3 <> 0 AND g4 <> p3 THEN 1 ELSE 0 END) AS ncross,
       |    GREATEST(a1, a2, a3, a4) AS peak,
       |    SQRT((((s1*s1 + s2*s2) + s3*s3) + s4*s4) / CAST(4.0 AS DOUBLE)) AS rms
       |  FROM pv
       |)
       |SELECT doc_id, 52 AS byte_len, 8000 AS width, 1 AS height, 4 AS n_frames,
       |  CAST((((a1 + a2) + a3) + a4) / CAST(4.0 AS DOUBLE) AS REAL) AS mean_abs,
       |  CAST(rms AS REAL) AS rms,
       |  CAST(peak AS REAL) AS peak,
       |  CAST(CAST(ncross AS REAL) / 4 AS REAL) AS zcr,
       |  CAST((((s1 + s2) + s3) + s4) / CAST(4.0 AS DOUBLE) AS REAL) AS dc_offset,
       |  CAST(peak - rms AS REAL) AS dyn_range,
       |  CAST(CAST(CASE WHEN a1 < CAST(0.01 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a2 < CAST(0.01 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a3 < CAST(0.01 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a4 < CAST(0.01 AS DOUBLE) THEN 1 ELSE 0 END AS REAL) / 4 AS REAL) AS silent_frac,
       |  CAST(CAST(CASE WHEN a1 > CAST(0.99 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a2 > CAST(0.99 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a3 > CAST(0.99 AS DOUBLE) THEN 1 ELSE 0 END
       |      + CASE WHEN a4 > CAST(0.99 AS DOUBLE) THEN 1 ELSE 0 END AS REAL) / 4 AS REAL) AS clipped_frac
       |FROM zc ORDER BY doc_id""".stripMargin
  }

  /** q155 — the real AUDIO parser oracled end to end (q154's twin):
    * genuine PCM16 WAVs with md5-derived samples run through the
    * standard pipeline into [[WavCodec]]'s actual RIFF/fmt/data parse,
    * every battery statistic matched bit-for-bit against DuckDB —
    * including the zero-crossing counter's carry-across-silence
    * semantics and the sqrt-based RMS (IEEE-exact in both engines).
    */
  val q155 = Q("q155_real_audio_decode", q155OracleSql) { (s, dir) =>
    decodeFeatures(assetStore(s, dir, "wav4"))
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        col("n_frames"),
        element_at(col("feature"), 1).as("mean_abs"),
        element_at(col("feature"), 2).as("rms"),
        element_at(col("feature"), 3).as("peak"),
        element_at(col("feature"), 4).as("zcr"),
        element_at(col("feature"), 5).as("dc_offset"),
        element_at(col("feature"), 6).as("dyn_range"),
        element_at(col("feature"), 7).as("silent_frac"),
        element_at(col("feature"), 8).as("clipped_frac"))
      .orderBy("doc_id")
  }

  /** 9×8 grayscale BMP (24-bit BI_RGB, top-down via negative height) for
    * the perceptual-hash dedup fixture: docs `4k..4k+3` share one base
    * image (row r's nine pixels = first nine md5 bytes of `"<k>_<r>"`,
    * masked to 0..127), and each variant `v = doc_id % 4` brightens ONE
    * pixel (row `v % 3`, col `doc_id % 9`) by `41·v` — a genuine
    * near-duplicate family: the dHash of any two variants differs in at
    * most 4 bits, all inside rows 0–2, while unrelated images sit ~30
    * bits apart. The payload is a real file a real decoder must parse.
    */
  private[graft] def synthBmpGrid(id: Long, groupOf: Int = 4): Array[Byte] = {
    val group = id / groupOf
    val variant = (id % groupOf).toInt
    val prow = variant % 3
    val pcol = (id % 9).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = 9; val h = 8
    val stride = ((w * 3 + 3) / 4) * 4
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(-h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var r = 0
    while (r < h) {
      val d = md.digest(s"${group}_$r".getBytes("UTF-8"))
      var c = 0
      while (c < w) {
        val v = (d(c) & 0xff) % 128 + (if (r == prow && c == pcol) 41 * variant else 0)
        buf.put(v.toByte).put(v.toByte).put(v.toByte)
        c += 1
      }
      var p = w * 3
      while (p < stride) { buf.put(0.toByte); p += 1 }
      r += 1
    }
    buf.array()
  }

  /** Real-parse a BI_RGB BMP into its blue-channel pixel grid, row-major
    * in IMAGE order (top-down) — the pixel-level sibling of
    * [[BmpCodec.decode]] with the identical header validation; positive
    * heights (bottom-up files) are flipped into image order.
    */
  private[graft] def parseBmpGray(b: Array[Byte]): (Int, Int, Array[Int]) = {
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte, "not a BMP")
    def i32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    val pixelOff = i32(10)
    val hdrSize = i32(14)
    val width = i32(18)
    val rawHeight = i32(22)
    val height = math.abs(rawHeight)
    val bpp = i16(28)
    require(hdrSize >= 40, s"unsupported DIB header size $hdrSize")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    require(bpp == 24 || bpp == 32, s"unsupported bpp $bpp")
    require(i32(30) == 0, "unsupported compression")
    val bytesPerPx = bpp / 8
    val rowStride = ((width * bytesPerPx + 3) / 4) * 4
    require(b.length >= pixelOff + rowStride.toLong * height, "truncated pixel array")
    val g = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val imgRow = if (rawHeight < 0) y else height - 1 - y
      val row = pixelOff + y * rowStride
      var x = 0
      while (x < width) {
        g(imgRow * width + x) = b(row + x * bytesPerPx) & 0xff
        x += 1
      }
      y += 1
    }
    (width, height, g)
  }

  /** 60-bit dHash over a gray grid: bit `r·(w−1)+c` is set iff pixel
    * (r, c+1) is brighter than (r, c) — the classic
    * difference-hash gradient signature, truncated to the repo's 60-bit
    * signature convention (keeps every band arithmetic positive-BIGINT
    * in both engines).
    */
  private[graft] def dhash60(w: Int, h: Int, g: Array[Int]): Long = {
    var sig = 0L
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w - 1) {
        val bit = r * (w - 1) + c
        if (bit < 60 && g(r * w + c + 1) > g(r * w + c)) sig |= 1L << bit
        c += 1
      }
      r += 1
    }
    sig
  }

  private val PhashHammingMax = 6
  private val PhashBandBits = 15

  /** One batch's image band rows in the LSH band-store schema
    * (doc_id, band_idx, band_hash) — the q174 signature scan feeding the
    * SAME streaming dedup store the text minhash bands use
    * (`LshStream.processBatch(family = Multimodal.phashBandFamily)`): the
    * store machinery is signature-agnostic, so image dedup gets
    * keep-earliest streaming maintenance, replay safety, and bucketed
    * compaction without new state code.
    */
  private[graft] def phashBands(batch: DataFrame): DataFrame =
    phashBandsOf(phashSigs(batch))

  /** [[phashBands]] over the SPARSE fixture ([[sparseImgId]]) — the
    * image half of the streamed cross-modal composition.
    */
  private[graft] def phashBandsSparse(batch: DataFrame): DataFrame =
    phashBandsOf(phashSigs(batch, sparseImgId))

  /** Banding-config identity of the IMAGE phash family: the dHash
    * signature kernel name, the band count, and the bits-per-band —
    * everything a phash band row's meaning depends on. A store banded
    * under other constants (different band width, a new signature
    * kernel) would join structurally fine and silently miss every
    * cross-configuration duplicate — the class `_band_conf` closed for
    * text, closed per modality here.
    */
  private[graft] lazy val phashBandConfigFingerprint: String = {
    val cfg = s"image-phash:dhash64:bands=4:bits=$PhashBandBits"
    java.security.MessageDigest.getInstance("MD5")
      .digest(cfg.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The image phash banding family (kernel + config identity). */
  private[graft] lazy val phashBandFamily =
    graft.streaming.LshStream.BandFamily("image-phash", phashBands,
      phashBandConfigFingerprint)

  /** [[phashBandFamily]] over the sparse fixture — SAME config identity
    * (the fixture id-mapping changes the input docs, not the banding
    * constants).
    */
  private[graft] lazy val phashBandFamilySparse =
    graft.streaming.LshStream.BandFamily("image-phash", phashBandsSparse,
      phashBandConfigFingerprint)

  private def phashBandsOf(sigs: DataFrame): DataFrame = {
    val mask = (1L << PhashBandBits) - 1
    sigs.select(col("doc_id"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band_idx"),
          shiftright(col("phash"), k * PhashBandBits).bitwiseAND(lit(mask))
            .as("band_hash"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
  }

  private def q174OracleSql: String = {
    val bandSelects = (0 until 4).map { k =>
      s"  SELECT doc_id, phash, $k AS band_idx, (phash >> ${k * PhashBandBits}) & ${(1 << PhashBandBits) - 1} AS band_val FROM sigs"
    }.mkString("\n  UNION ALL\n")
    s"""WITH px AS (
       |  SELECT doc_id, g.r AS r,
       |    list_transform(generate_series(0, 8), c ->
       |      CAST('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR) || '_' || CAST(g.r AS VARCHAR)), 2*c + 1, 2) AS INT) % 128
       |      + CASE WHEN g.r = (doc_id % 4) % 3 AND c = doc_id % 9 THEN CAST(41 * (doc_id % 4) AS INT) ELSE 0 END) AS v
       |  FROM documents, generate_series(0, 7) AS g(r)
       |), hb AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 7), c ->
       |    CASE WHEN r*8 + c < 60 AND v[c+2] > v[c+1] THEN CAST(1 AS BIGINT) << CAST(r*8 + c AS INT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS rowbits
       |  FROM px
       |), sigs AS (
       |  SELECT doc_id, CAST(SUM(rowbits) AS BIGINT) AS phash FROM hb GROUP BY doc_id
       |), bands AS (
       |$bandSelects
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, a.phash AS ph_a, b.doc_id AS doc_b, b.phash AS ph_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id <> b.doc_id
       |), near AS (
       |  SELECT doc_id, COUNT(*) AS n_candidates,
       |    SUM(CASE WHEN bit_count(xor(ph_a, ph_b)) <= $PhashHammingMax THEN 1 ELSE 0 END) AS n_near_dups,
       |    MIN(bit_count(xor(ph_a, ph_b))) AS min_hamming,
       |    SUM(CASE WHEN bit_count(xor(ph_a, ph_b)) <= $PhashHammingMax AND doc_b < doc_id THEN 1 ELSE 0 END) AS n_earlier
       |  FROM pairs GROUP BY doc_id
       |)
       |SELECT s.doc_id, s.phash,
       |  CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  CAST(COALESCE(n.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  CAST(n.min_hamming AS INTEGER) AS min_hamming,
       |  COALESCE(n.n_earlier, 0) = 0 AS keep
       |FROM sigs s LEFT JOIN near n ON s.doc_id = n.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  /** q174 — perceptual-hash IMAGE dedup, end to end through a real
    * decoder: per-doc synthetic BMPs with PLANTED near-duplicate families
    * (see [[synthBmpGrid]]) are parsed by the actual BMP pixel parser,
    * dHash'd ([[dhash60]]), banded 4×15 bits (the q32 SimHash machinery
    * applied to image gradients), and Hamming ≤ 6 within a band bucket is
    * a near-duplicate; `keep` is the keep-first dedup verdict (no
    * near-dup with a smaller doc_id). The oracle recomputes pixels, hash,
    * banding, and verdicts from the same md5 arithmetic — exact-integer
    * end to end. At 100 TB this is one shuffle on (band_idx, band_val)
    * with ~1-row buckets at 15-bit bands; candidates, never all pairs.
    */
  val q174 = Q("q174_image_phash_dedup", q174OracleSql) { (s, dir) =>
    val assets = assetStore(s, dir, "grid_bmp")
    // the default band width follows the corpus size ([[autoBandBits]]):
    // every fixture scale resolves to the 15-bit oracle configuration,
    // and a corpus past ~131 k docs widens automatically instead of
    // hitting the measured 110× candidate explosion by default. The
    // count never touches the binary pages (payload column pruned).
    phashReport(phashSigsFromAssets(assets), autoBandBits(assets.count()))
  }

  /** Synthesize + REAL-parse + dHash the fixture image of every doc_id
    * in `docs` — the signature scan of the image-dedup pipeline.
    * `fixtureId` remaps the doc to its fixture identity: q174 uses the
    * dense default (every quad a family); q186 passes [[sparseImgId]]
    * so only every 5th quad is a family and everything else is unique.
    */
  private[graft] def phashSigs(docs: DataFrame,
      fixtureId: Long => Long = identity): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, g) = parseBmpGray(synthBmpGrid(fixtureId(id)))
        (id, dhash60(w, h, g))
      })
      .toDF("doc_id", "phash")
  }

  /** Disjoint fixture-group namespace base for the sparse mappings: a
    * non-family doc's group becomes doc_id + k·10⁹, which can never
    * collide with a family group (≤ corpus/4) or another doc's.
    */
  private val SparseNs = 1000000000L

  /** SPARSE image-family mapping: docs in every 5th quad keep their
    * dense family identity (group doc_id/4, variant doc_id%4); every
    * other doc maps to a unique group at variant 0 — ~20 % of the corpus
    * in planted near-dup families, the rest genuinely unique, so a
    * cross-modal composition over this fixture is non-degenerate.
    */
  private[graft] def sparseImgId(d: Long): Long =
    if ((d / 4) % 5 == 0) d else (d + SparseNs) * 4

  /** SPARSE audio-family mapping — same construction at a DIFFERENT
    * phase ((d/4) % 5 == 1), so the image-dup and audio-dup doc sets are
    * disjoint by construction and the cross-modal verdict actually has
    * to consult all three modalities.
    */
  private[graft] def sparseAudId(d: Long): Long =
    if ((d / 4) % 5 == 1) d else (d + 2 * SparseNs) * 4

  /** q174's banding + Hamming verify + keep-first report over any
    * (doc_id, phash) frame. `bandBits` widens the bands for larger
    * corpora (the occupancy mitigation — see `Scratch mmprobe`): recall
    * for ≤(60/bandBits − 1)-bit-apart pairs stays structural, bucket
    * collisions shrink 2^Δ-fold.
    */
  /** Corpus-size-driven band width — the `mmprobe`-measured operating
    * rule made the DEFAULT instead of a manual knob: 15-bit band buckets
    * collect candidates in proportion to occupancy (n·(n−1)/2 pairs per
    * band spread over 2^bits buckets, INFLATED ~7× by correlated
    * adjacent dHash bits — at the probe's 16×/80 k-doc corpus that was
    * 110× the candidates, 2.88 M vs 26 k, and widening to 20 bits
    * collapsed it 8.6×). So pick the narrowest divisor-of-60 width that
    * keeps expected per-band bucket occupancy at ≤ ½ doc (n ≤ 2^(bits−1)):
    * 15 bits to 16 k docs, 20 bits to 524 k, then 30 — the probe's bad
    * point (80 k docs) lands on 20 bits, its good 1× point (5 k) stays on
    * the 15-bit oracle configuration. Recall stays STRUCTURAL while
    * within-family bit flips fit inside all-but-one band (≤ 60 −
    * bandBits·(nBands−1) flipped bits: 15 @ 4×15, 20 @ 3×20, 30 @ 2×30) —
    * the fixture's flips sit in bits < 24, so one high band is always
    * clean at every width (spec-pinned).
    */
  private[graft] def autoBandBits(nDocs: Long): Int =
    Seq(15, 20, 30).find(b => nDocs <= (1L << (b - 1))).getOrElse(30)

  private[graft] def phashReport(sigs: DataFrame,
      bandBits: Int = PhashBandBits): DataFrame =
    phashVerdicts(sigs, bandBits).orderBy("doc_id")

  /** [[phashReport]] without the presentation sort — the composable
    * verdict frame q186 joins on.
    */
  private[graft] def phashVerdicts(sigs: DataFrame,
      bandBits: Int = PhashBandBits): DataFrame = {
    val nBands = 60 / bandBits
    val mask = (1L << bandBits) - 1
    val bands = sigs.select(col("doc_id"), col("phash"),
      explode(array((0 until nBands).map(k =>
        struct(lit(k).as("band_idx"),
          shiftright(col("phash"), k * bandBits).bitwiseAND(lit(mask)).as("band_val"))): _*)).as("b"))
      .select(col("doc_id"), col("phash"), col("b.band_idx"), col("b.band_val"))
    val other = bands.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"),
      col("band_idx").as("bi"), col("band_val").as("bv"))
    val near = bands
      .join(other, col("band_idx") === col("bi") && col("band_val") === col("bv") &&
        col("doc_id") =!= col("doc_b"))
      .select(col("doc_id"), col("doc_b"),
        bit_count(col("phash").bitwiseXOR(col("ph_b"))).as("hamming"))
      .distinct()
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_candidates"),
        Det.countIf(col("hamming") <= PhashHammingMax).as("n_near_dups"),
        min(col("hamming")).as("min_hamming"),
        Det.countIf(col("hamming") <= PhashHammingMax && col("doc_b") < col("doc_id"))
          .as("n_earlier"))
    sigs.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("min_hamming"),
        (coalesce(col("n_earlier"), lit(0L)) === 0L).as("keep"))
  }

  /** 64-sample PCM16 mono WAV for the audio-fingerprint dedup fixture:
    * docs `4k..4k+3` share one base recording (sample block j's eight
    * int16s come from md5 of `"<k>_<j>"`, folded into ±15000), and each
    * variant `v = doc_id % 4` nudges ONE sample (index `doc_id % 32`,
    * i.e. always in the FIRST half) by `256·v` — an audio near-duplicate
    * family whose second-half energy envelope is bit-identical across
    * variants while unrelated recordings differ everywhere.
    */
  private[graft] def synthWav64(id: Long, groupOf: Int = 4): Array[Byte] = {
    val group = id / groupOf
    val variant = (id % groupOf).toInt
    val pos = (id % 32).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = java.nio.ByteBuffer.allocate(44 + 128).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 128).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    buf.putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(128)
    var j = 0
    while (j < 8) {
      val d = md.digest(s"${group}_$j".getBytes("UTF-8"))
      var i = 0
      while (i < 8) {
        val hv = ((d(2 * i) & 0xff) << 8) | (d(2 * i + 1) & 0xff)
        val s = hv % 30000 - 15000 + (if (8 * j + i == pos) 256 * variant else 0)
        buf.putShort(s.toShort)
        i += 1
      }
      j += 1
    }
    buf.array()
  }

  /** Real-parse a PCM16 mono WAV into its raw int16 samples — the
    * sample-level sibling of [[WavCodec.decode]] with the identical
    * RIFF/fmt/data chunk walk, kept in exact integers (no /32768) so the
    * downstream fingerprint arithmetic is integer-exact end to end.
    */
  private[graft] def parseWavPcm16(b: Array[Byte]): Array[Int] = {
    require(b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
      && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a WAV")
    def i32(off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    var off = 12
    var fmtOff = -1
    var dataOff = -1
    var dataLen = 0
    while (off + 8 <= b.length && (fmtOff < 0 || dataOff < 0)) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = i32(off + 4)
      require(sz >= 0, s"bad chunk size $sz")
      if (id == "fmt ") fmtOff = off + 8
      else if (id == "data") { dataOff = off + 8; dataLen = math.min(sz, b.length - dataOff) }
      off += 8 + sz + (sz & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0, "missing fmt/data chunk")
    require(i16(fmtOff) == 1 && i16(fmtOff + 2) == 1 && i16(fmtOff + 14) == 16,
      "only PCM16 mono")
    Array.tabulate(dataLen / 2)(f =>
      ((b(dataOff + 2 * f) & 0xff) | (b(dataOff + 2 * f + 1) << 8)).toShort.toInt)
  }

  /** L1 tolerance for the envelope verify: each variant perturbs one
    * window by ≤ 3·256, so a within-family pair sits ≤ 1536 apart while
    * unrelated envelopes differ by ~10⁵.
    */
  private val AudioL1Max = 1600L

  private def q176OracleSql: String =
    s"""WITH blk AS (
       |  SELECT doc_id, g.j AS j,
       |    list_transform(generate_series(0, 7), i ->
       |      CAST('0x' || substr(md5(CAST(doc_id // 4 AS VARCHAR) || '_' || CAST(g.j AS VARCHAR)), 4*i + 1, 4) AS INT) % 30000 - 15000
       |      + CASE WHEN 8*g.j + i = doc_id % 32 THEN CAST(256 * (doc_id % 4) AS INT) ELSE 0 END) AS sl
       |  FROM documents, generate_series(0, 7) AS g(j)
       |), smp AS (
       |  SELECT doc_id, flatten(list(sl ORDER BY j)) AS u FROM blk GROUP BY doc_id
       |), env AS (
       |  SELECT doc_id, list_transform(generate_series(0, 15), k ->
       |    CAST(abs(u[4*k+1]) + abs(u[4*k+2]) + abs(u[4*k+3]) + abs(u[4*k+4]) AS BIGINT)) AS env
       |  FROM smp
       |), codes AS (
       |  SELECT doc_id, env,
       |    CAST(list_sum(list_transform(generate_series(0, 7), k -> (env[k+1] >> 10) << (6*k))) AS BIGINT) AS code1,
       |    CAST(list_sum(list_transform(generate_series(0, 7), k -> (env[k+9] >> 10) << (6*k))) AS BIGINT) AS code2
       |  FROM env
       |), probes AS (
       |  SELECT doc_id, env, 0 AS probe, code1 AS code FROM codes
       |  UNION ALL
       |  SELECT doc_id, env, 1 AS probe, code2 AS code FROM codes
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS doc_b, a.env AS ea, b.env AS eb
       |  FROM probes a JOIN probes b
       |    ON a.probe = b.probe AND a.code = b.code AND a.doc_id <> b.doc_id
       |), dist AS (
       |  SELECT doc_id, doc_b,
       |    CAST(list_sum(list_transform(generate_series(1, 16), k -> abs(ea[k] - eb[k]))) AS BIGINT) AS l1
       |  FROM pairs
       |), near AS (
       |  SELECT doc_id, COUNT(*) AS n_candidates,
       |    SUM(CASE WHEN l1 <= $AudioL1Max THEN 1 ELSE 0 END) AS n_near_dups,
       |    MIN(l1) AS min_l1,
       |    SUM(CASE WHEN l1 <= $AudioL1Max AND doc_b < doc_id THEN 1 ELSE 0 END) AS n_earlier
       |  FROM dist GROUP BY doc_id
       |)
       |SELECT c.doc_id, c.code1, c.code2,
       |  CAST(COALESCE(n.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  CAST(COALESCE(n.n_near_dups, 0) AS BIGINT) AS n_near_dups,
       |  CAST(n.min_l1 AS BIGINT) AS min_l1,
       |  COALESCE(n.n_earlier, 0) = 0 AS keep
       |FROM codes c LEFT JOIN near n ON c.doc_id = n.doc_id
       |ORDER BY c.doc_id""".stripMargin

  /** q176 — audio-fingerprint dedup, end to end through the real WAV
    * parse: per-doc synthetic PCM16 recordings with planted families
    * ([[synthWav64]]) are sample-parsed ([[parseWavPcm16]]), reduced to a
    * 16-window |amplitude| energy envelope, quantized (>>10) into two
    * 48-bit half-codes, and near-dups are found the way production audio
    * fingerprinting works: exact inverted-index probes on either
    * half-code propose candidates, an integer L1 distance over the full
    * envelope verifies them (≤ [[AudioL1Max]]), keep-first wins. A
    * DIFFERENT dedup mechanism from q174's banded Hamming — quantize →
    * probe → verify — and integer-exact in both engines. At 100 TB: two
    * probe rows per recording, one shuffle on (probe, code), candidate
    * verification only within code buckets, never all pairs.
    */
  val q176 = Q("q176_audio_fingerprint_dedup", q176OracleSql) { (s, dir) =>
    audioReport(audioCodesFromAssets(assetStore(s, dir, "wav64")))
  }

  /** Synthesize + REAL-parse + envelope-code the fixture recording of
    * every doc_id in `docs` — the fingerprint scan of the audio-dedup
    * pipeline.
    */
  private[graft] def audioCodes(docs: DataFrame,
      fixtureId: Long => Long = identity): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id =>
        envCodeRow(id, parseWavPcm16(synthWav64(fixtureId(id))))))
      .toDF("doc_id", "code1", "code2", "env")
  }

  /** Samples → (doc_id, code1, code2, env) fingerprint row — the shared
    * kernel of [[audioCodes]] (synth path) and [[audioCodesFromAssets]]
    * (stored-payload path); one definition keeps the two bit-identical.
    */
  private def envCodeRow(id: Long, smp: Array[Int]): (Long, Long, Long, Seq[Long]) = {
    val env = Array.tabulate(16)(k =>
      (math.abs(smp(4 * k)) + math.abs(smp(4 * k + 1)) +
        math.abs(smp(4 * k + 2)) + math.abs(smp(4 * k + 3))).toLong)
    def half(h: Int): Long =
      (0 until 8).map(k => (env(8 * h + k) >> 10) << (6 * k)).sum
    (id, half(0), half(1), env.toSeq)
  }

  /** q176's probe + L1-verify + keep-first report over any
    * (doc_id, code1, code2, env) frame.
    */
  private[graft] def audioReport(codes: DataFrame): DataFrame =
    audioVerdicts(codes).orderBy("doc_id")

  /** [[audioReport]] without the presentation sort — the composable
    * verdict frame q186 joins on.
    */
  private[graft] def audioVerdicts(codes: DataFrame): DataFrame = {
    val probes = codes.select(col("doc_id"), col("env"),
      explode(array(
        struct(lit(0).as("probe"), col("code1").as("code")),
        struct(lit(1).as("probe"), col("code2").as("code")))).as("p"))
      .select(col("doc_id"), col("env"), col("p.probe"), col("p.code"))
    val other = probes.select(col("doc_id").as("doc_b"), col("env").as("eb"),
      col("probe").as("pb"), col("code").as("cb"))
    val near = probes
      .join(other, col("probe") === col("pb") && col("code") === col("cb") &&
        col("doc_id") =!= col("doc_b"))
      .select(col("doc_id"), col("doc_b"), col("env").as("ea"), col("eb"))
      .distinct()
      .select(col("doc_id"), col("doc_b"),
        aggregate(zip_with(col("ea"), col("eb"), (x, y) => abs(x - y)),
          lit(0L), (a, x) => a + x).as("l1"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_candidates"),
        Det.countIf(col("l1") <= AudioL1Max).as("n_near_dups"),
        min(col("l1")).as("min_l1"),
        Det.countIf(col("l1") <= AudioL1Max && col("doc_b") < col("doc_id"))
          .as("n_earlier"))
    codes.join(near, Seq("doc_id"), "left")
      .select(col("doc_id"), col("code1"), col("code2"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_near_dups"), lit(0L)).as("n_near_dups"),
        col("min_l1"),
        (coalesce(col("n_earlier"), lit(0L)) === 0L).as("keep"))
  }

  /** One batch's audio probe rows in the LSH band-store schema
    * (doc_id, band_idx, band_hash) — the q176 fingerprint scan feeding
    * the SAME streaming dedup store text minhash bands and image phash
    * bands use (`LshStream.processBatch(family = Multimodal.audioBandFamily)`):
    * probe index is the band index, the 48-bit half-code the band hash.
    * At 48-bit exact codes a band match IS the near-dup verdict whenever
    * cross-family code collisions are absent (structural for the
    * fixture, and 2⁻⁴⁸-rare in general — production audio fp would add
    * the L1 verify at serving time, reading envelopes by doc_id).
    */
  private[graft] def audioBands(batch: DataFrame): DataFrame =
    audioBandsOf(audioCodes(batch))

  /** [[audioBands]] over the SPARSE fixture ([[sparseAudId]]) — the
    * audio half of the streamed cross-modal composition.
    */
  private[graft] def audioBandsSparse(batch: DataFrame): DataFrame =
    audioBandsOf(audioCodes(batch, sparseAudId))

  /** Banding-config identity of the AUDIO code family: the envelope
    * fingerprint kernel and the two 48-bit half-code probes.
    */
  private[graft] lazy val audioBandConfigFingerprint: String = {
    val cfg = "audio-env:halfcode48:bands=2"
    java.security.MessageDigest.getInstance("MD5")
      .digest(cfg.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** The audio code banding family (kernel + config identity). */
  private[graft] lazy val audioBandFamily =
    graft.streaming.LshStream.BandFamily("audio-code", audioBands,
      audioBandConfigFingerprint)

  /** [[audioBandFamily]] over the sparse fixture — same config. */
  private[graft] lazy val audioBandFamilySparse =
    graft.streaming.LshStream.BandFamily("audio-code", audioBandsSparse,
      audioBandConfigFingerprint)

  private def audioBandsOf(codes: DataFrame): DataFrame =
    codes.select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band_idx"), col("code1").as("band_hash")),
        struct(lit(1).as("band_idx"), col("code2").as("band_hash")))).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))

  /** Audio-store decisions with the integer-L1 envelope verify applied
    * at DECISION-SERVING time — the layer the band store alone omits: a
    * 48-bit half-code match PROPOSES (cross-family collisions are
    * 2⁻⁴⁸-rare, structurally absent on the fixture), and this read
    * re-decodes the envelopes of the IMPLICATED docs only (each flagged
    * doc and its recorded partner — never the corpus) and clears any
    * verdict whose pair fails the same L1 ≤ [[AudioL1Max]] gate batch
    * q176 applies. Serving cost: one decision-store scan + O(dup set)
    * decodes + two doc_id hash joins.
    */
  private[graft] def audioDecisionsVerified(spark: SparkSession,
      decisionsDir: String, docs: DataFrame,
      fixtureId: Long => Long = identity): DataFrame = {
    val d = graft.streaming.LshStream.decisions(spark, decisionsDir)
    val flagged = d.filter(col("is_band_dup")).select("doc_id", "dup_of")
    val implicated = flagged.select(col("doc_id"))
      .union(flagged.select(col("dup_of").as("doc_id"))).distinct()
    val envs = audioCodes(docs.join(implicated, Seq("doc_id"), "left_semi"),
        fixtureId)
      .select(col("doc_id"), col("env"))
    val l1 = flagged
      .join(envs, Seq("doc_id"))
      .join(envs.select(col("doc_id").as("dup_of"), col("env").as("env_b")),
        Seq("dup_of"))
      .select(col("doc_id"),
        aggregate(zip_with(col("env"), col("env_b"), (x, y) => abs(x - y)),
          lit(0L), (a, x) => a + x).as("l1"))
    d.join(l1, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_earlier"),
        when(col("l1") > AudioL1Max, lit(null)).otherwise(col("dup_of"))
          .as("dup_of"),
        when(col("l1") > AudioL1Max, lit(false)).otherwise(col("is_band_dup"))
          .as("is_band_dup"))
      .orderBy("doc_id")
  }

  // ── q186: cross-modal consolidated curation ────────────────────────────

  private def q186OracleSql: String = {
    val imgGroup =
      "CASE WHEN (doc_id // 4) % 5 = 0 THEN CAST(doc_id // 4 AS VARCHAR) ELSE CAST(doc_id + 1000000000 AS VARCHAR) END"
    val imgBump =
      "CASE WHEN (doc_id // 4) % 5 = 0 AND g.r = (doc_id % 4) % 3 AND c = doc_id % 9 THEN CAST(41 * (doc_id % 4) AS INT) ELSE 0 END"
    val audGroup =
      "CASE WHEN (doc_id // 4) % 5 = 1 THEN CAST(doc_id // 4 AS VARCHAR) ELSE CAST(doc_id + 2000000000 AS VARCHAR) END"
    val audNudge =
      "CASE WHEN (doc_id // 4) % 5 = 1 AND 8*g.j + i = doc_id % 32 THEN CAST(256 * (doc_id % 4) AS INT) ELSE 0 END"
    val bandSelects = (0 until 4).map { k =>
      s"  SELECT doc_id, phash, $k AS band_idx, (phash >> ${k * PhashBandBits}) & ${(1 << PhashBandBits) - 1} AS band_val FROM isigs"
    }.mkString("\n  UNION ALL\n")
    s"""WITH ttk AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
       |), tsh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN [array_to_string(t[i:i+2], ' ') for i in range(1, len(t) - 1)]
       |    ELSE [array_to_string(t, ' ')] END) AS ss FROM ttk
       |), ths AS (
       |  SELECT doc_id, list_transform(ss, s -> ${graft.ops.Dedup.h60Sql("s")}) AS hh FROM tsh
       |), tex AS (
       |  SELECT doc_id, unnest(hh) AS h FROM ths
       |), tsz AS (
       |  SELECT doc_id, len(hh) AS sz FROM ths
       |), tshared AS (
       |  SELECT a.doc_id AS doc_id, b.doc_id AS doc_b, COUNT(*) AS n_shared
       |  FROM tex a JOIN tex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), tdup AS (
       |  SELECT DISTINCT s.doc_b AS doc_id
       |  FROM tshared s
       |  JOIN tsz sa ON s.doc_id = sa.doc_id
       |  JOIN tsz sb ON s.doc_b = sb.doc_id
       |  WHERE 5 * s.n_shared >= 4 * (sa.sz + sb.sz - s.n_shared)
       |), px AS (
       |  SELECT doc_id, g.r AS r,
       |    list_transform(generate_series(0, 8), c ->
       |      CAST('0x' || substr(md5($imgGroup || '_' || CAST(g.r AS VARCHAR)), 2*c + 1, 2) AS INT) % 128
       |      + $imgBump) AS v
       |  FROM documents, generate_series(0, 7) AS g(r)
       |), hb AS (
       |  SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 7), c ->
       |    CASE WHEN r*8 + c < 60 AND v[c+2] > v[c+1] THEN CAST(1 AS BIGINT) << CAST(r*8 + c AS INT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS rowbits
       |  FROM px
       |), isigs AS (
       |  SELECT doc_id, CAST(SUM(rowbits) AS BIGINT) AS phash FROM hb GROUP BY doc_id
       |), ibands AS (
       |$bandSelects
       |), idup AS (
       |  SELECT DISTINCT a.doc_id AS doc_id
       |  FROM ibands a JOIN ibands b
       |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND b.doc_id < a.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHammingMax
       |), blk AS (
       |  SELECT doc_id, g.j AS j,
       |    list_transform(generate_series(0, 7), i ->
       |      CAST('0x' || substr(md5($audGroup || '_' || CAST(g.j AS VARCHAR)), 4*i + 1, 4) AS INT) % 30000 - 15000
       |      + $audNudge) AS sl
       |  FROM documents, generate_series(0, 7) AS g(j)
       |), smp AS (
       |  SELECT doc_id, flatten(list(sl ORDER BY j)) AS u FROM blk GROUP BY doc_id
       |), env AS (
       |  SELECT doc_id, list_transform(generate_series(0, 15), k ->
       |    CAST(abs(u[4*k+1]) + abs(u[4*k+2]) + abs(u[4*k+3]) + abs(u[4*k+4]) AS BIGINT)) AS env
       |  FROM smp
       |), acodes AS (
       |  SELECT doc_id, env,
       |    CAST(list_sum(list_transform(generate_series(0, 7), k -> (env[k+1] >> 10) << (6*k))) AS BIGINT) AS code1,
       |    CAST(list_sum(list_transform(generate_series(0, 7), k -> (env[k+9] >> 10) << (6*k))) AS BIGINT) AS code2
       |  FROM env
       |), aprobes AS (
       |  SELECT doc_id, env, 0 AS probe, code1 AS code FROM acodes
       |  UNION ALL
       |  SELECT doc_id, env, 1 AS probe, code2 AS code FROM acodes
       |), apairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS doc_b, a.env AS ea, b.env AS eb
       |  FROM aprobes a JOIN aprobes b
       |    ON a.probe = b.probe AND a.code = b.code AND b.doc_id < a.doc_id
       |), adup AS (
       |  SELECT DISTINCT doc_id FROM apairs
       |  WHERE CAST(list_sum(list_transform(generate_series(1, 16), k -> abs(ea[k] - eb[k]))) AS BIGINT) <= $AudioL1Max
       |)
       |SELECT d.doc_id, d.source,
       |  t.doc_id IS NULL AS text_keep,
       |  i.doc_id IS NULL AS img_keep,
       |  a.doc_id IS NULL AS audio_keep,
       |  (t.doc_id IS NULL AND i.doc_id IS NULL AND a.doc_id IS NULL) AS accepted,
       |  CASE WHEN t.doc_id IS NOT NULL THEN 'text_near'
       |       WHEN i.doc_id IS NOT NULL THEN 'image_near'
       |       WHEN a.doc_id IS NOT NULL THEN 'audio_near'
       |       ELSE NULL END AS reason
       |FROM documents d
       |LEFT JOIN tdup t ON d.doc_id = t.doc_id
       |LEFT JOIN idup i ON d.doc_id = i.doc_id
       |LEFT JOIN adup a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q186 — CROSS-MODAL consolidated curation: one keep/quarantine
    * verdict per document from all three modalities at once — text
    * near-dup (exact Jaccard ≥ 0.8 over shared-shingle candidates,
    * tested in EXACT integers as 5·|A∩B| ≥ 4·|A∪B| so the threshold
    * never rides a float), image near-dup (q174's dHash banding +
    * Hamming verify over the SPARSE fixture [[sparseImgId]]), and audio
    * near-dup (q176's envelope probe + L1 verify over [[sparseAudId]]).
    * Keep-first within each modality; `reason` is the first failing
    * modality in text → image → audio order, q127's
    * first-failing-stage convention extended across modalities. The
    * sparse fixtures put ~20 % of docs in image families and a disjoint
    * ~20 % in audio families while the corpus's own text near-dups land
    * where they land — all three verdict columns carry information, so
    * the composition is non-degenerate. At 100 TB each modality is the
    * already-measured candidate-bounded join (shingle index / 15-bit
    * band buckets / exact code probes), and the composition itself is
    * three broadcast-sized left joins on doc_id.
    */
  val q186 = Q("q186_crossmodal_curation", q186OracleSql) { (s, dir) =>
    graft.functions.ShingleHashes.register(s)
    crossModalOf(Catalog.table(s, dir, "documents"),
      assets = Some(s.read.parquet(buildAssetStore(s, dir))))
  }

  /** q186 over any (doc_id, source, text) frame — keep-first verdicts
    * among the FRAME's docs only, so CorpusRun's stage 13 audits the
    * accepted store against itself (a quarantined doc is gone; it cannot
    * be anyone's earlier duplicate). With `assets` the image/audio
    * signatures come off the STORED payload columns (semi-joined to the
    * frame's docs, so subset semantics are preserved); without it the
    * synth generator runs in-task.
    */
  private[graft] def crossModalOf(d: DataFrame,
      assets: Option[DataFrame] = None): DataFrame = {
    graft.functions.ShingleHashes.register(d.sparkSession)
    val tp = graft.ops.Dedup.jaccardPairs(d.select(col("doc_id"), col("text")))
    val tdup = tp
      .filter(lit(5) * col("n_shared") >=
        lit(4) * (col("size_a") + col("size_b") - col("n_shared")))
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("t_dup", lit(true))
    def stored(kind: String) = assets.map(_
      .filter(col("kind") === kind)
      .join(d.select("doc_id"), Seq("doc_id"), "left_semi"))
    val isigs = stored("grid_bmp_sparse").map(phashSigsFromAssets)
      .getOrElse(phashSigs(d, sparseImgId))
    val asigs = stored("wav64_sparse").map(audioCodesFromAssets)
      .getOrElse(audioCodes(d, sparseAudId))
    val idup = phashVerdicts(isigs)
      .select(col("doc_id"), col("keep").as("img_keep"))
    val adup = audioVerdicts(asigs)
      .select(col("doc_id"), col("keep").as("audio_keep"))
    d.select(col("doc_id"), col("source"))
      .join(tdup, Seq("doc_id"), "left")
      .join(idup, Seq("doc_id"))
      .join(adup, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        (!coalesce(col("t_dup"), lit(false))).as("text_keep"),
        col("img_keep"), col("audio_keep"))
      .withColumn("accepted",
        col("text_keep") && col("img_keep") && col("audio_keep"))
      .withColumn("reason",
        when(!col("text_keep"), lit("text_near"))
          .when(!col("img_keep"), lit("image_near"))
          .when(!col("audio_keep"), lit("audio_near")))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(q37, q154, q155, q174, q176, q186)
}
