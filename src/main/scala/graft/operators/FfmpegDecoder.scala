package graft.operators

import org.apache.spark.sql.Row

/**
 * Optional ffmpeg/ffprobe SUBPROCESS decoder behind the [[Multimodal]]
 * mapPartitions seam — the "richer media" path the round-5 review named
 * as the remaining multimodal gap (ref: server/index.js:336-465 implies
 * an image-only pipeline; video/compressed audio need a demuxer no stock
 * JVM ships).
 *
 * Behavior is environment-adaptive and DETERMINISTIC either way:
 *  - binaries present (probed once per JVM, i.e. once per executor):
 *    container metadata via `ffprobe` (CSV output — no parser
 *    dependency) and first-frame / sampled-frame grayscale decode via
 *    `ffmpeg` rawvideo piping;
 *  - binaries absent (this build environment): callers fall back to
 *    [[Multimodal.decodeStub]]'s deterministic pseudo-features, so the
 *    driver gates are environment-stable.
 *
 * Subprocess discipline (the part that must be right at scale): payload
 * bytes stream to the child's stdin from a dedicated thread while the
 * parent drains stdout — writing then reading sequentially deadlocks on
 * the pipe buffer for any payload over ~64 KB. stderr is discarded
 * (`-v error` keeps it empty in the happy path). One process per
 * PAYLOAD, not per partition: ffmpeg holds per-input demux state, but
 * the fork cost is amortized by the batched mapPartitions seam exactly
 * like codec init. No temp files — both ends are pipes.
 *
 * Tests override [[binaryDir]] to a directory of scripted fakes, which
 * exercises the full subprocess plumbing (stdin feed, stdout chunking,
 * CSV parse, failure fallbacks) without real codecs; a second,
 * `assume`-guarded spec runs the real path when a genuine ffmpeg exists.
 */
object FfmpegDecoder {

  /** Test seam: when set, binaries are resolved ONLY inside this
    * directory (and the per-JVM availability cache is bypassed). */
  @volatile private[operators] var binaryDir: Option[String] = None

  private lazy val pathFfprobe: Option[String] = findOnPath("ffprobe")
  private lazy val pathFfmpeg: Option[String] = findOnPath("ffmpeg")

  private def findOnPath(name: String): Option[String] =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .map(d => new java.io.File(d, name))
      .find(f => f.isFile && f.canExecute)
      .map(_.getAbsolutePath)

  private def resolve(name: String): Option[String] = binaryDir match {
    case Some(dir) =>
      val f = new java.io.File(dir, name)
      if (f.isFile && f.canExecute) Some(f.getAbsolutePath) else None
    case None => if (name == "ffprobe") pathFfprobe else pathFfmpeg
  }

  /** Both binaries resolvable right now (per-JVM lazy unless overridden). */
  def available: Boolean = resolve("ffprobe").isDefined && resolve("ffmpeg").isDefined

  /** Container metadata of the first video stream:
    * (codec, width, height, nbFrames). `nbFrames` is -1 when the
    * container doesn't carry it (common for streams). */
  private[operators] def probeMeta(bytes: Array[Byte]): Option[(String, Int, Int, Long)] =
    resolve("ffprobe").flatMap { bin =>
      run(Seq(bin, "-v", "error", "-select_streams", "v:0",
        "-show_entries", "stream=codec_name,width,height,nb_frames",
        "-of", "csv=p=0", "pipe:0"), bytes).flatMap { out =>
        val line = new String(out, java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.map(_.trim).find(_.nonEmpty).getOrElse("")
        line.split(",") match {
          case Array(codec, w, h, rest @ _*) =>
            try {
              val frames = rest.headOption
                .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
                .getOrElse(-1L)
              Some((codec.trim, w.trim.toInt, h.trim.toInt, frames))
            } catch { case _: NumberFormatException => None }
          case _ => None
        }
      }
    }

  /** Up to `maxFrames` grayscale frames, every `everyNth`, as raw
    * `width*height`-byte planes (rawvideo pix_fmt gray — splitting the
    * concatenated stdout by plane size is exact, no format parsing). */
  private[operators] def grayFrames(bytes: Array[Byte], width: Int, height: Int,
                                    everyNth: Int, maxFrames: Int): Seq[Array[Byte]] = {
    val plane = width.toLong * height
    if (plane <= 0 || plane > Int.MaxValue) return Seq.empty
    resolve("ffmpeg").flatMap { bin =>
      run(Seq(bin, "-v", "error", "-i", "pipe:0",
        "-vf", s"select=not(mod(n\\,$everyNth))", "-vsync", "0",
        "-frames:v", maxFrames.toString,
        "-f", "rawvideo", "-pix_fmt", "gray", "pipe:1"), bytes)
    } match {
      case Some(out) if out.length >= plane =>
        (0 until (out.length / plane.toInt)).map { i =>
          java.util.Arrays.copyOfRange(out, i * plane.toInt, (i + 1) * plane.toInt)
        }
      case _ => Seq.empty
    }
  }

  /** Full video decode → [[Multimodal.featureType]]-shaped Row: container
    * dimensions + the 4×4 mean-luminance grid of the FIRST frame (the
    * same resolution-independent signature [[Multimodal.decodeImage]]
    * computes for stills). None → caller falls back to the stub. */
  private[operators] def decodeVideo(bytes: Array[Byte]): Option[Row] =
    probeMeta(bytes).flatMap { case (_, w, h, _) =>
      grayFrames(bytes, w, h, everyNth = 1, maxFrames = 1).headOption.map { plane =>
        val grid = 4
        val sums = new Array[Double](grid * grid)
        val counts = new Array[Int](grid * grid)
        var y = 0
        while (y < h) {
          val gy = math.min(grid - 1, y * grid / h)
          var x = 0
          while (x < w) {
            val cell = gy * grid + math.min(grid - 1, x * grid / w)
            sums(cell) += (plane(y * w + x) & 0xFF) / 255.0
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val feature = Array.tabulate(grid * grid) { i =>
          if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat
        }
        Row(w, h, 3, feature)
      }
    }

  /** Sampled frames → (frameIndex, grayPlane) pairs for
    * [[Multimodal.sampleFrames]]. Empty → caller falls back to the stub
    * frame synthesizer. */
  private[operators] def videoFrames(bytes: Array[Byte], everyNth: Int,
                                     maxFrames: Int): Seq[(Int, Array[Byte])] =
    probeMeta(bytes) match {
      case Some((_, w, h, _)) =>
        grayFrames(bytes, w, h, everyNth, maxFrames).zipWithIndex.map {
          case (plane, i) => (i * everyNth, plane)
        }
      case None => Seq.empty
    }

  /** Feed `input` to the child's stdin (dedicated thread) while draining
    * stdout; Some(stdout) iff exit code 0. Any spawn/IO failure → None —
    * a corrupt payload or missing binary must degrade to the stub, never
    * fail the task. */
  private[operators] def run(cmd: Seq[String], input: Array[Byte]): Option[Array[Byte]] =
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      val feeder = new Thread(() => {
        try {
          val os = p.getOutputStream
          try os.write(input) finally os.close()
        } catch { case _: java.io.IOException => () } // child closed early: fine
      })
      feeder.setDaemon(true)
      feeder.start()
      val out = p.getInputStream.readAllBytes()
      feeder.join(10000)
      val exited = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      if (exited && p.exitValue() == 0) Some(out)
      else { p.destroyForcibly(); None }
    } catch { case _: Exception => None }
}
