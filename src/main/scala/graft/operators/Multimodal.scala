package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/video
 * payloads travel as opaque `binary` columns beside a typed metadata
 * struct. The Spark-side mechanics — schema convention, magic-byte type
 * sniffing, batched per-partition decode plumbing, partition sizing — are
 * real and tested. IMAGE decode is real (`javax.imageio`: PNG/JPEG/GIF/BMP
 * → dimensions, channels, 4×4 mean-luminance feature grid); PCM WAV/AIFF
 * decode is real (`javax.sound.sampled`); richer media (video,
 * compressed audio) decodes through the [[FfmpegDecoder]] subprocess
 * seam WHEN ffmpeg/ffprobe binaries exist in the runtime environment,
 * and falls back to a DETERMINISTIC STUB when they don't (as in this
 * build environment), clearly marked below — so gate results are stable
 * per environment either way.
 *
 * Everything before the decode stays in whole-stage codegen (built-ins
 * only); the decode runs via `mapPartitions` — the JVM analogue of a
 * vectorized Python `mapInPandas` — so each task amortizes codec setup
 * across a whole batch instead of paying it per row.
 */
object Multimodal {

  /** Metadata struct carried beside every binary payload column. */
  val metadataType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("content_hash", LongType)))

  /**
   * Sniff media type from magic bytes + attach the metadata struct —
   * pure built-ins (hex prefix compare), no UDF, stays in codegen.
   */
  def withMetadata(df: DataFrame, binCol: String, metaCol: String = "meta"): DataFrame = {
    val prefix = upper(hex(substring(col(binCol), 1, 12)))
    val mime =
      when(prefix.startsWith("89504E47"), "image/png")
        .when(prefix.startsWith("FFD8FF"), "image/jpeg")
        .when(prefix.startsWith("47494638"), "image/gif")
        .when(prefix.startsWith("52494646") && substring(prefix, 17, 8) === "57415645", "audio/wav")
        .when(substring(prefix, 9, 8) === "66747970", "video/mp4") // ....ftyp
        .when(prefix.startsWith("4F676753"), "audio/ogg")
        .otherwise("application/octet-stream")
    df.withColumn(metaCol, struct(
      mime.as("mime"),
      length(col(binCol)).cast(LongType).as("n_bytes"),
      xxhash64(col(binCol)).as("content_hash")))
  }

  /** Feature row produced by the decode stage. */
  val featureType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /**
   * Batched decode / feature-extraction over a binary column.
   *
   * Plumbing (real): per-partition iteration in fixed-size batches; one
   * codec initialization per partition, not per row; output schema is
   * the input schema + a typed feature struct; input partition count is
   * preserved so upstream `repartition` controls task granularity.
   *
   * Decode: [[decodeImage]] (real, javax.imageio) for payloads carrying
   * a stock-JRE image signature — PNG, JPEG, GIF, BMP, TIFF only; then
   * [[decodeAudio]] (real, javax.sound.sampled) for RIFF/WAVE and AIFF
   * PCM; everything else falls back to [[decodeStub]]'s deterministic
   * pseudo-features (clearly a stub — no video/compressed-audio codecs
   * here). The signature gate is deliberate (SPI-registry contention,
   * see [[looksLikeImage]]) and EXCLUDES two decodable-in-principle
   * classes: WBMP (magic-less — any byte stream "parses", so gating on
   * it is impossible) and plugin formats registered by third-party
   * ImageIO providers (WebP/ICO readers etc.) — both stub rather than
   * decode.
   */
  def decodeFeatures(df: DataFrame, binCol: String,
                     featCol: String = "feat", batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField(featCol, featureType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // Codec init, once per partition: in-memory decode only — ImageIO's
      // default disk-backed cache would serialize tasks on tmp-file IO.
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](binIdx)
          Row.fromSeq(r.toSeq :+ decodeImage(bytes))
        }
      }
    }(enc)
  }

  /**
   * REAL image decode via `javax.imageio`: dimensions + color channels +
   * a 4×4 mean-luminance grid (16 floats in [0,1], resolution-independent
   * — downstream similarity/grouping sees a stable signature regardless
   * of source size). Only payloads with a PNG/JPEG/GIF/BMP/TIFF
   * signature reach ImageIO (the [[looksLikeImage]] gate — WBMP and
   * plugin-registered formats are deliberately excluded); everything
   * else, including images the gate skips and payloads ImageIO then
   * fails to parse, falls back to audio probing and finally the
   * deterministic stub.
   */
  /**
   * Magic-byte gate before any global-SPI codec call. `ImageIO.read` /
   * `AudioSystem.getAudioInputStream` walk JVM-GLOBAL provider
   * registries whose probing serializes under executor concurrency —
   * measured on the sf1 board: a corpus of non-media payloads decoded
   * 25× (not 10×) slower at 10× data once 32 tasks contended on SPI
   * scans, while a single sf0.1 partition hid the contention entirely.
   * Every reader a stock JRE ships carries one of these signatures
   * (PNG/JPEG/GIF/BMP/TIFF; WBMP is deliberately excluded — it has no
   * magic and accepts arbitrary bytes), so payloads without one go
   * straight to the fallback without touching the registry.
   */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 0x50) ||                     // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||              // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||               // GIF
      (b(0) == 'B' && b(1) == 'M') ||                              // BMP
      (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||   // TIFF LE
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))     // TIFF BE

  /** RIFF/WAVE or AIFF `FORM` header — the PCM containers
    * [[decodeAudio]] can actually parse; same SPI-contention rationale
    * as [[looksLikeImage]]. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M'))

  private[operators] def decodeImage(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return Row(0, 0, 0, Array.empty[Float])
    if (!looksLikeImage(bytes)) return decodeAudio(bytes)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) decodeAudio(bytes)
    else {
      val grid = 4
      val (sums, counts) = lumaGrid(img, grid)
      val feature = Array.tabulate(grid * grid) { i =>
        if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat
      }
      Row(img.getWidth, img.getHeight, img.getColorModel.getNumComponents, feature)
    }
  }

  /**
   * 64-bit perceptual image hash (aHash): 8×8 mean-luminance grid, bit i
   * set iff cell i is brighter than the global mean. Invariant to
   * lossless re-encoding AND to uniform brightness shifts (every cell
   * and the mean move together); near-identical images differ in few
   * bits, so downstream exact-or-Hamming grouping (the SimHash chunk
   * trick) finds visual near-dups that byte-level md5 never can. NULL
   * for anything outside the decoded set: only PNG/JPEG/GIF/BMP/TIFF
   * signatures reach ImageIO ([[looksLikeImage]] — WBMP and
   * plugin-registered formats deliberately excluded), and payloads the
   * decoder then rejects are NULL too.
   */
  def imagePhash(df: DataFrame, binCol: String,
                 hashCol: String = "phash"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(hashCol, org.apache.spark.sql.types.LongType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map(r => Row.fromSeq(r.toSeq :+ phashOne(r.getAs[Array[Byte]](binIdx))))
    }(enc)
  }

  private[operators] def phashOne(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.isEmpty) return null
    if (!looksLikeImage(bytes)) return null // never probe the SPI registry
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) null
    else {
      val grid = 8
      val (sums, counts) = lumaGrid(img, grid)
      var total = 0.0
      var n = 0
      var i = 0
      while (i < grid * grid) {
        if (counts(i) > 0) { sums(i) /= counts(i); total += sums(i); n += 1 }
        i += 1
      }
      val mean = if (n > 0) total / n else 0.0
      var hash = 0L
      i = 0
      while (i < grid * grid) {
        if (counts(i) > 0 && sums(i) > mean) hash |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(hash)
    }
  }

  /** Shared mean-luminance accumulation for [[decodeImage]] (4×4 float
    * grid) and [[phashOne]] (8×8 aHash): per-cell luminance sums and
    * pixel counts via one bulk getRGB pass. */
  private def lumaGrid(img: java.awt.image.BufferedImage,
                       grid: Int): (Array[Double], Array[Int]) = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Int](grid * grid)
    // bulk pixel fetch: one colorspace conversion pass instead of a
    // virtual getRGB + ColorModel convert per pixel (~10× on 4K images)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val gy = math.min(grid - 1, y * grid / h)
      val rowOff = y * w
      var x = 0
      while (x < w) {
        val rgb = px(rowOff + x)
        val lum = (((rgb >> 16) & 0xFF) * 0.299 +
          ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
        val cell = gy * grid + math.min(grid - 1, x * grid / w)
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    (sums, counts)
  }

  /**
   * REAL audio decode via `javax.sound.sampled` (PCM WAV/AIFF — the
   * formats a stock JVM parses): width = frame count, height = sample
   * rate (Hz), channels = channel count, feature = 8-bucket RMS envelope
   * over the first channel, normalized to [0,1] — a compact loudness
   * signature for similarity/quality filtering. Unparseable payloads
   * (video, MP3/OGG, garbage) fall through to the stub.
   */
  private[operators] def decodeAudio(bytes: Array[Byte]): Row = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    // non-PCM-container payloads skip the AudioSystem SPI probe but still
    // reach the ffmpeg seam (video/compressed audio have their own magics
    // the subprocess prober understands)
    if (bytes == null || !looksLikeAudio(bytes)) return ffmpegOrStub(bytes)
    val parsed =
      try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val enc = fmt.getEncoding
          val signed = enc == AudioFormat.Encoding.PCM_SIGNED
          // only raw PCM is decodable without a codec; compressed
          // encodings (MP3/OGG wrapped in WAV, ULAW...) → stub below
          if (!signed && enc != AudioFormat.Encoding.PCM_UNSIGNED) None
          else {
            val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
            // frameSize can be NOT_SPECIFIED (-1): derive channels×width
            val frameSize =
              if (fmt.getFrameSize > 0) fmt.getFrameSize
              else bytesPerSample * math.max(1, fmt.getChannels)
            val big = fmt.isBigEndian
            val data = in.readAllBytes()
            val n = data.length / frameSize
            val fullScale = (1L << (bytesPerSample * 8 - 1)).toDouble
            val buckets = 8
            val sums = new Array[Double](buckets)
            val counts = new Array[Int](buckets)
            var i = 0
            while (i < n) {
              // first channel of the frame, any width 8/16/24/32, both endiannesses
              val off = i * frameSize
              var raw = 0L
              var b = 0
              while (b < bytesPerSample) {
                val byteVal = data(off + (if (big) b else bytesPerSample - 1 - b)) & 0xFF
                raw = (raw << 8) | byteVal
                b += 1
              }
              val sample =
                if (signed) { // sign-extend from sample width
                  val shift = 64 - bytesPerSample * 8
                  ((raw << shift) >> shift).toDouble / fullScale
                } else raw.toDouble / fullScale - 1.0
              val bk = math.min(buckets - 1, i * buckets / math.max(1, n))
              sums(bk) += sample * sample
              counts(bk) += 1
              i += 1
            }
            val feature = Array.tabulate(buckets) { b =>
              if (counts(b) == 0) 0.0f else math.sqrt(sums(b) / counts(b)).toFloat
            }
            val frames = in.getFrameLength
            Some(Row(if (frames >= 0) frames.toInt else n,
              fmt.getSampleRate.toInt, fmt.getChannels, feature))
          }
        } finally in.close()
      } catch { case _: Exception => None }
    parsed.getOrElse(ffmpegOrStub(bytes))
  }

  /** The video/compressed-audio seam: a REAL `ffmpeg` subprocess decode
    * when the binaries exist in this environment ([[FfmpegDecoder]] —
    * probed once per JVM), else the deterministic stub — so the same
    * build serves codec-equipped clusters and codec-free CI with stable
    * gate results in each. */
  private def ffmpegOrStub(bytes: Array[Byte]): Row =
    if (FfmpegDecoder.available)
      FfmpegDecoder.decodeVideo(bytes).getOrElse(decodeStub(bytes))
    else decodeStub(bytes)

  /**
   * STUB decode — deterministic fake standing in for a video/compressed-
   * audio codec call (none available in this build environment; images
   * and PCM audio take the REAL paths above, and richer media takes the
   * [[FfmpegDecoder]] subprocess path when binaries exist). Produces
   * plausible dimensions and an 8-float signature derived from the byte
   * content, so downstream plumbing (similarity over features, grouping
   * by dimensions) is exercised with stable values.
   */
  private[operators] def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.isEmpty) return Row(0, 0, 0, Array.empty[Float])
    val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, 42)
    val width = 64 + math.abs(h % 1024)
    val height = 64 + math.abs((h / 1024) % 1024)
    val feature = Array.tabulate(8) { i =>
      (scala.util.hashing.MurmurHash3.bytesHash(bytes, i) % 1000) / 1000.0f
    }
    Row(width, height, 3, feature)
  }

  /**
   * REAL image resize via `java.awt` (bilinear, deterministic for a given
   * JRE): decode → scale to (targetW, targetH) → re-encode as PNG bytes
   * in a new binary column. NULL for anything outside the decoded set —
   * the PNG/JPEG/GIF/BMP/TIFF signature gate applies here as to
   * [[imagePhash]] (WBMP and plugin-registered formats deliberately
   * excluded), as does the parse-failure fallback. Same batched
   * `mapPartitions` shape as [[decodeFeatures]]: codec init once per
   * partition, partition count preserved, so upstream `repartition` /
   * `maxPartitionBytes` size the tasks.
   */
  def resizeImages(df: DataFrame, binCol: String, targetW: Int, targetH: Int,
                   outCol: String = "resized"): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val schema = StructType(df.schema.fields :+ StructField(outCol, BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      // plain per-row map: unlike decodeFeatures there is no per-batch
      // state to amortize, and buffering payload batches would only pin
      // binary arrays in memory
      rows.map { r =>
        Row.fromSeq(r.toSeq :+ resizeOne(r.getAs[Array[Byte]](binIdx), targetW, targetH))
      }
    }(enc)
  }

  private[operators] def resizeOne(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (bytes == null || bytes.isEmpty) return null
    if (!looksLikeImage(bytes)) return null // never probe the SPI registry
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Schema of one sampled frame row. */
  val frameType: StructType = StructType(Seq(
    StructField("frame_index", IntegerType),
    StructField("frame", BinaryType)))

  /**
   * Frame sampling over video payloads: every `everyNth` frame up to
   * `maxFrames`, one output row per sampled frame (input row columns
   * preserved). The Spark-side plumbing — batched `mapPartitions`,
   * per-partition decoder init, bounded fan-out, partition preservation —
   * is real; the frame DECODER is the declared [[decodeStub]]-grade seam
   * (deterministic fake frames derived from content; an ffmpeg binding
   * drops in at `frameDecoder`), since no video codec ships in this
   * environment.
   */
  def sampleFrames(df: DataFrame, binCol: String,
                   everyNth: Int = 30, maxFrames: Int = 8): DataFrame = {
    require(everyNth >= 1 && maxFrames >= 1)
    val schema = StructType(df.schema.fields ++
      Seq(StructField("frame_index", IntegerType), StructField("frame", BinaryType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        frameDecoder(bytes, everyNth, maxFrames).map { case (idx, frame) =>
          Row.fromSeq(r.toSeq ++ Seq(idx, frame))
        }
      }
    }(enc)
  }

  /**
   * Frame decoder (the ffmpeg seam): the REAL [[FfmpegDecoder]]
   * subprocess demux when binaries exist (grayscale planes, exact
   * rawvideo splitting), else a deterministic STUB that derives a frame
   * count from the payload and emits 16-byte fake "frames" keyed by
   * (content, frame index) — stable values so downstream joins/specs
   * exercise real plumbing in codec-free environments.
   */
  private[operators] def frameDecoder(bytes: Array[Byte], everyNth: Int,
                                      maxFrames: Int): Seq[(Int, Array[Byte])] = {
    if (bytes == null || bytes.isEmpty) return Seq.empty
    if (FfmpegDecoder.available) {
      val real = FfmpegDecoder.videoFrames(bytes, everyNth, maxFrames)
      if (real.nonEmpty) return real
    }
    val totalFrames = 1 + math.abs(
      scala.util.hashing.MurmurHash3.bytesHash(bytes, 7) % 600)
    (0 until totalFrames by everyNth).take(maxFrames).map { idx =>
      val h = scala.util.hashing.MurmurHash3.bytesHash(bytes, idx)
      idx -> Array.tabulate[Byte](16)(i => ((h >> (i % 4 * 8)) & 0xff).toByte)
    }
  }

  /**
   * Frame/chunk sampling plan for long media: rows whose payload exceeds
   * `chunkBytes` are exploded into (chunk_index, offset, length) plan rows
   * — pure built-ins; the actual chunk decode would go through
   * [[decodeFeatures]] on the sliced payload.
   */
  def chunkPlan(df: DataFrame, binCol: String, chunkBytes: Int = 1 << 20): DataFrame = {
    val n = ceil(length(col(binCol)).cast(DoubleType) / chunkBytes).cast(IntegerType)
    df.withColumn("chunk_index", explode(sequence(lit(0), greatest(n, lit(1)) - 1)))
      .withColumn("chunk_offset", col("chunk_index").cast(LongType) * chunkBytes)
      .withColumn("chunk_length",
        least(lit(chunkBytes.toLong),
          length(col(binCol)).cast(LongType) - col("chunk_offset")))
  }
}
