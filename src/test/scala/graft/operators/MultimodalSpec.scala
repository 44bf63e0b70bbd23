package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
    0, 0, 0, 0x0d)
  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte,
    0, 0x10, 'J', 'F', 'I', 'F', 0, 0)
  private val wav = "RIFF1234WAVEfmt ".getBytes
  private val junk = "hello world, not an image".getBytes

  private lazy val media = df("id BIGINT, payload BINARY",
    Seq(Row(1L, png), Row(2L, jpeg), Row(3L, wav), Row(4L, junk)))

  test("magic-byte mime sniffing via built-ins only") {
    val out = Multimodal.withMetadata(media, "payload")
    val mimes = out.select("id", "meta.mime").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(mimes == Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/wav", 4L -> "application/octet-stream"))
    // metadata plumbing: byte count + content hash present
    val meta = out.filter("id = 4").select("meta.n_bytes").head().getLong(0)
    assert(meta == junk.length.toLong)
  }

  test("decode plumbing: schema extended, deterministic stub features, batching") {
    val out = Multimodal.decodeFeatures(media, "payload", batchSize = 2)
    assert(out.schema.fieldNames.toSeq == Seq("id", "payload", "feat"))
    val feats = out.select("id", "feat.width", "feat.feature").collect()
    assert(feats.length == 4)
    // determinism: same bytes → same stub features on a second run
    val again = Multimodal.decodeFeatures(media, "payload").select("id", "feat.width")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    feats.foreach(r => assert(again(r.getLong(0)) == r.getInt(1)))
    // features usable downstream (e.g. similarity over the float array)
    assert(feats.forall(_.getSeq[Float](2).length == 8))
  }

  test("REAL image decode: a 2x2 PNG yields exact dimensions and luminance grid") {
    // Encode a real 2×2 PNG in-memory: white, black / red, blue.
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFFFFFF); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0xFF0000); img.setRGB(1, 1, 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val pngBytes = bos.toByteArray

    val one = df("id BIGINT, payload BINARY", Seq(Row(1L, pngBytes)))
    val meta = Multimodal.withMetadata(one, "payload").select("meta.mime").head().getString(0)
    assert(meta == "image/png") // a real PNG also sniffs correctly

    val feat = Multimodal.decodeFeatures(one, "payload").select("feat.*").head()
    assert(feat.getInt(0) == 2 && feat.getInt(1) == 2) // exact dimensions
    assert(feat.getInt(2) == 3)                        // RGB channels
    val grid = feat.getSeq[Float](3)
    assert(grid.length == 16)
    // each pixel lands alone in a grid cell: corners carry its luminance
    assert(math.abs(grid.head - 1.0f) < 1e-3)           // white → 1.0
    assert(grid.forall(v => v >= 0.0f && v <= 1.0f))
  }

  test("REAL audio decode: a generated PCM WAV yields frames, rate, channels, RMS envelope") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.1s of a 440 Hz sine at 8 kHz mono, 16-bit LE PCM
    val rate = 8000f
    val n = 800
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 12000).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wavBytes = bos.toByteArray

    val one = df("id BIGINT, payload BINARY", Seq(Row(1L, wavBytes)))
    assert(Multimodal.withMetadata(one, "payload")
      .select("meta.mime").head().getString(0) == "audio/wav")
    val feat = Multimodal.decodeFeatures(one, "payload").select("feat.*").head()
    assert(feat.getInt(0) == n)          // frame count
    assert(feat.getInt(1) == 8000)       // sample rate
    assert(feat.getInt(2) == 1)          // mono
    val env = feat.getSeq[Float](3)
    assert(env.length == 8)
    // a constant-amplitude sine has RMS ≈ amplitude/√2 in every bucket
    val expected = (12000.0 / 32768.0 / math.sqrt(2)).toFloat
    env.foreach(v => assert(math.abs(v - expected) < 0.02f, s"RMS bucket $v"))
  }

  test("REAL image resize: dimensions change, content decodes, junk yields null") {
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 3).foreach(y => img.setRGB(x, y, 0x00FF00)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val in = df("id BIGINT, payload BINARY",
      Seq(Row(1L, bos.toByteArray), Row(2L, junk)))

    val resized = Multimodal.resizeImages(in, "payload", targetW = 2, targetH = 2)
    assert(resized.schema.fieldNames.toSeq == Seq("id", "payload", "resized"))
    val byId = resized.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized")).toMap
    assert(byId(2L) == null) // undecodable → null, row preserved
    // decoding the resized payload yields the target dimensions
    val out = Multimodal.decodeFeatures(
      df("id BIGINT, payload BINARY", Seq(Row(1L, byId(1L)))), "payload")
      .select("feat.width", "feat.height").head()
    assert(out.getInt(0) == 2 && out.getInt(1) == 2)
    // resize is deterministic: same input → same bytes
    val again = Multimodal.resizeImages(in, "payload", 2, 2)
      .filter("id = 1").select("resized").head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(again, byId(1L)))
  }

  test("frame sampling: bounded fan-out, deterministic stub frames, row columns preserved") {
    val vids = df("id BIGINT, payload BINARY",
      Seq(Row(1L, "fake video payload one".getBytes),
        Row(2L, "another fake video".getBytes), Row(3L, Array.empty[Byte])))
    val frames = Multimodal.sampleFrames(vids, "payload", everyNth = 30, maxFrames = 4)
    assert(frames.schema.fieldNames.toSeq == Seq("id", "payload", "frame_index", "frame"))
    val byId = frames.collect().groupBy(_.getLong(0))
    assert(!byId.contains(3L))                       // empty payload → no frames
    byId.values.foreach(rs => assert(rs.length >= 1 && rs.length <= 4))
    byId.values.foreach(rs =>
      assert(rs.map(_.getInt(2)).toSeq == rs.map(_.getInt(2)).toSeq.sorted))
    // deterministic across runs
    val again = Multimodal.sampleFrames(vids, "payload", everyNth = 30, maxFrames = 4)
      .collect().groupBy(_.getLong(0))
    assert(again.view.mapValues(_.length).toMap == byId.view.mapValues(_.length).toMap)
  }

  // ---- ffmpeg seam ------------------------------------------------------

  /** Write scripted fake ffprobe/ffmpeg binaries into a temp dir: the
    * fake probe reports an 8×4 "video"; the fake ffmpeg emits two 32-byte
    * gray planes (value 0x80 → luminance 128/255). Exercises the WHOLE
    * subprocess plumbing — stdin feed thread, stdout chunking, CSV parse,
    * exit-code gating — without any real codec. */
  private def withFakeBinaries[T](probeOut: String, frameBytes: Int)(body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("fake_ffmpeg")
    def script(name: String, content: String): Unit = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, content.getBytes)
      p.toFile.setExecutable(true)
    }
    // both scripts must drain stdin or the feeder thread sees EPIPE
    script("ffprobe", s"#!/bin/sh\ncat > /dev/null\necho '$probeOut'\n")
    script("ffmpeg", s"#!/bin/sh\ncat > /dev/null\nhead -c $frameBytes /dev/zero | tr '\\0' '\\200'\n")
    FfmpegDecoder.binaryDir = Some(dir.toString)
    try body
    finally {
      FfmpegDecoder.binaryDir = None
      dir.toFile.listFiles().foreach(_.delete()); dir.toFile.delete()
    }
  }

  test("ffmpeg seam (scripted fakes): probe CSV parse, rawvideo plane split, feature grid") {
    withFakeBinaries("fakecodec,8,4,10", frameBytes = 64) {
      assert(FfmpegDecoder.available)
      assert(FfmpegDecoder.probeMeta(junk).contains(("fakecodec", 8, 4, 10L)))
      // 64 bytes of 0x80 = two 8×4 gray planes
      val frames = FfmpegDecoder.videoFrames(junk, everyNth = 3, maxFrames = 5)
      assert(frames.map(_._1) == Seq(0, 3))
      assert(frames.forall(_._2.length == 32))
      // full decode: dimensions from the probe, 4×4 grid of 128/255
      val row = FfmpegDecoder.decodeVideo(junk).get
      assert(row.getInt(0) == 8 && row.getInt(1) == 4)
      // a GenericRow carries the raw Array[Float] (the Spark encoder
      // wraps it only inside a DataFrame)
      val feat = row.get(3).asInstanceOf[Array[Float]].toSeq
      assert(feat.length == 16)
      assert(feat.forall(f => math.abs(f - 128f / 255f) < 1e-6))
      // and the Multimodal chain routes junk through the ffmpeg path now
      val viaChain = Multimodal.decodeFeatures(
        df("id BIGINT, payload BINARY", Seq(Row(1L, junk))), "payload")
        .select("feat.width", "feat.height").head()
      assert((viaChain.getInt(0), viaChain.getInt(1)) == ((8, 4)))
    }
  }

  test("ffmpeg seam: probe failure (nonzero exit) and absent binaries fall back to stub") {
    val stub = Multimodal.decodeStub(junk)
    // absent: no binaries in the override dir
    val empty = java.nio.file.Files.createTempDirectory("no_ffmpeg")
    FfmpegDecoder.binaryDir = Some(empty.toString)
    try {
      assert(!FfmpegDecoder.available)
      assert(FfmpegDecoder.probeMeta(junk).isEmpty)
      val viaChain = Multimodal.decodeFeatures(
        df("id BIGINT, payload BINARY", Seq(Row(1L, junk))), "payload")
        .select("feat.width").head().getInt(0)
      assert(viaChain == stub.getInt(0))
    } finally { FfmpegDecoder.binaryDir = None; empty.toFile.delete() }
    // present but failing (exit 1): decode degrades to the stub, task survives
    withFakeBinaries("fakecodec,8,4,10", frameBytes = 64) {
      val dir = FfmpegDecoder.binaryDir.get
      val p = java.nio.file.Paths.get(dir, "ffprobe")
      java.nio.file.Files.write(p, "#!/bin/sh\ncat > /dev/null\nexit 1\n".getBytes)
      assert(FfmpegDecoder.decodeVideo(junk).isEmpty)
      val viaChain = Multimodal.decodeFeatures(
        df("id BIGINT, payload BINARY", Seq(Row(1L, junk))), "payload")
        .select("feat.width").head().getInt(0)
      assert(viaChain == stub.getInt(0))
    }
  }

  test("ffmpeg seam: REAL binaries (skipped when ffmpeg is not installed)") {
    assume(FfmpegDecoder.available, "no ffmpeg/ffprobe on PATH — skipping real-codec test")
    // a genuine ffmpeg can synthesize its own test input
    val gen = FfmpegDecoder.run(Seq("ffmpeg", "-f", "lavfi", "-i",
      "testsrc=duration=1:size=64x48:rate=10", "-f", "avi", "pipe:1"), Array.empty)
    assume(gen.isDefined, "ffmpeg lavfi synthesis unavailable")
    val avi = gen.get
    val meta = FfmpegDecoder.probeMeta(avi)
    assert(meta.exists { case (_, w, h, _) => w == 64 && h == 48 })
    val row = FfmpegDecoder.decodeVideo(avi)
    assert(row.exists(r => r.getInt(0) == 64 && r.getInt(1) == 48))
  }

  test("partition count is preserved through the decode (sizing stays upstream)") {
    val repart = media.repartition(3)
    assert(Multimodal.decodeFeatures(repart, "payload").rdd.getNumPartitions == 3)
  }

  test("perceptual hash: re-encode and brightness invariant, content sensitive") {
    def png(f: (Int, Int) => Int, w: Int = 16, h: Int = 16): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // left half dark, right half bright
    val base = png((x, _) => if (x < 8) 0x202020 else 0xD0D0D0)
    // same pixels decoded+re-encoded → identical bytes are NOT required,
    // identical phash IS
    val reencoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // uniform brightness lift: every cell and the mean move together
    val brighter = png((x, _) => if (x < 8) 0x303030 else 0xE0E0E0)
    // different content: top/bottom split instead of left/right
    val flipped = png((_, y) => if (y < 8) 0x202020 else 0xD0D0D0)

    val rows = df("id BIGINT, payload BINARY", Seq(
      Row(1L, base), Row(2L, reencoded), Row(3L, brighter), Row(4L, flipped),
      Row(5L, "not an image".getBytes("UTF-8"))))
    val ph = Multimodal.imagePhash(rows, "payload")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(ph(1L).isDefined && ph(1L) == ph(2L))
    assert(ph(1L) == ph(3L))
    assert(ph(1L) != ph(4L))
    assert(ph(5L).isEmpty)
    // the hash actually encodes the geometry: exactly half the bits set
    assert(java.lang.Long.bitCount(ph(1L).get) == 32)
  }

  test("chunk plan explodes oversized payloads with exact offsets") {
    val big = df("id BIGINT, payload BINARY",
      Seq(Row(1L, Array.fill[Byte](2500)(1)), Row(2L, Array.fill[Byte](10)(2))))
    val plan = Multimodal.chunkPlan(big, "payload", chunkBytes = 1000)
    val rows = plan.select("id", "chunk_index", "chunk_offset", "chunk_length")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.count(_._1 == 1L) == 3)
    assert(rows.filter(_._1 == 1L).map(_._4).sum == 2500)
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0L, 10L)))
  }
}
