package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass evaluation of the Gopher quality-rule battery
 * (operators.QualityFilter): all eight metrics from a single scan of the
 * document string, returned as a struct.
 *
 * The composable Column formulation (QualityFilter.metricsHof) re-splits
 * the text per metric and evaluates the filter/transform/aggregate
 * lambdas as interpreted CodegenFallback trees; this expression computes
 * identical values (spec-pinned, including Spark's exact `round(x, 6)`
 * HALF_UP semantics and space-only trim behavior) in one imperative pass
 * inside whole-stage codegen.
 */
object NativeQuality {

  /** The Gopher stopword probe list (Rae et al. 2021, §A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  // Gopher keep-thresholds (word-count bounds stay per-call parameters) —
  // the single source for the flag column, the native keep expression,
  // and the oracle SQL; tune here and every formulation moves together.
  val MeanWordLenMin = 3.0
  val MeanWordLenMax = 10.0
  val SymbolRatioMax = 0.1
  val BulletFracMax = 0.9
  val EllipsisFracMax = 0.3
  val AlphaFracMin = 0.8
  val StopwordsMin = 2
  val DupLineFracMax = 0.3

  private val stopSet: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    gopherStopwords.foreach(s.add)
    s
  }

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("n_stopwords", IntegerType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false)))

  /** Spark's round(x, 6): BigDecimal HALF_UP at scale 6. */
  private def round6(x: Double): Double =
    JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Space-only trim — Spark/DuckDB `trim` semantics (Java's String.trim
    * strips all control chars ≤ U+0020 and would diverge). */
  private def spaceTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def codePoints(s: String): Int = s.codePointCount(0, s.length)

  /** Code-point lexicographic compare — Java's String.compareTo orders by
    * UTF-16 code unit, which ranks supplementary-plane characters BELOW
    * U+E000..U+FFFF; DuckDB (and Spark's UTF8String sorts) order by code
    * point, so ties must break the same way. */
  private def compareCodePoints(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def metrics(text: UTF8String): InternalRow = {
    val s = text.toString
    val trimmed = spaceTrim(s)

    // words: split(trim(text), "\s+") keeping empties (Spark limit -1),
    // then drop zero-length tokens
    val toks = trimmed.split("\\s+", -1)
    var nWords = 0
    var sumWordLen = 0L
    var nAlphaWords = 0
    var nStop = 0
    var i = 0
    while (i < toks.length) {
      val w = toks(i)
      if (w.length > 0) {
        nWords += 1
        sumWordLen += codePoints(w)
        var j = 0
        var hasAlpha = false
        while (j < w.length && !hasAlpha) {
          val c = w.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          j += 1
        }
        if (hasAlpha) nAlphaWords += 1
        if (stopSet.contains(w.toLowerCase(Locale.ROOT))) nStop += 1
      }
      i += 1
    }

    // symbol counts over the RAW text: '#' chars + non-overlapping "..."
    var nHash = 0
    i = 0
    while (i < s.length) { if (s.charAt(i) == '#') nHash += 1; i += 1 }
    var nEll = 0
    var at = s.indexOf("...")
    while (at >= 0) { nEll += 1; at = s.indexOf("...", at + 3) }

    // lines: split(text, "\n"), blank (space-only) lines dropped
    val rawLines = s.split("\n", -1)
    var nLines = 0
    var nBullet = 0
    var nEllLine = 0
    i = 0
    while (i < rawLines.length) {
      val l = rawLines(i)
      val lt = spaceTrim(l)
      if (lt.length > 0) {
        nLines += 1
        val c0 = lt.charAt(0)
        if (c0 == '-' || c0 == '*' || c0 == '•') nBullet += 1
        // rtrim(l).endsWith("...") — lt is trim(l); trailing side equal
        if (lt.endsWith("...")) nEllLine += 1
      }
      i += 1
    }

    // segments for dup-line fraction: split(trim(text), "\n"), blank
    // dropped, distinct over the ORIGINAL (untrimmed) segment strings
    val rawSegs = trimmed.split("\n", -1)
    var nSegs = 0
    val seen = new java.util.HashSet[String]()
    var nDistinct = 0
    i = 0
    while (i < rawSegs.length) {
      val seg = rawSegs(i)
      if (spaceTrim(seg).length > 0) {
        nSegs += 1
        if (seen.add(seg)) nDistinct += 1
      }
      i += 1
    }

    val meanWordLen =
      if (nWords > 0) round6(sumWordLen.toDouble / nWords.toDouble) else 0.0
    // (len - len(replace(text,'...','')))/3 is exact: 3*nEll/3.0 == nEll
    val symbolRatio =
      if (nWords > 0) round6((nHash.toDouble + nEll.toDouble) / nWords.toDouble) else 0.0
    val bulletFrac =
      if (nLines > 0) round6(nBullet.toDouble / nLines.toDouble) else 0.0
    val ellipsisFrac =
      if (nLines > 0) round6(nEllLine.toDouble / nLines.toDouble) else 0.0
    val alphaFrac =
      if (nWords > 0) round6(nAlphaWords.toDouble / nWords.toDouble) else 0.0
    val dupLineFrac =
      if (nSegs > 0) round6((nSegs - nDistinct).toDouble / nSegs.toDouble) else 0.0

    new GenericInternalRow(Array[Any](
      nWords, meanWordLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, nStop, dupLineFrac))
  }

  /** The Gopher keep decision in ONE evaluation (FilterExec has no
    * common-subexpression elimination, so a filter over the metric
    * struct's fields would re-evaluate [[metrics]] per conjunct —
    * this computes the battery once per row). Thresholds compare the
    * same rounded values as QualityFilter's flag column, so the two
    * formulations keep identical sets (spec-pinned). */
  def gopherKeep(text: UTF8String, minWords: Int, maxWords: Int): Boolean = {
    val m = metrics(text)
    m.getInt(0) >= minWords && m.getInt(0) <= maxWords &&
      m.getDouble(1) >= MeanWordLenMin && m.getDouble(1) <= MeanWordLenMax &&
      m.getDouble(2) < SymbolRatioMax && m.getDouble(3) < BulletFracMax &&
      m.getDouble(4) < EllipsisFracMax && m.getDouble(5) >= AlphaFracMin &&
      m.getInt(6) >= StopwordsMin && m.getDouble(7) < DupLineFracMax
  }

  val repetitionSchema: StructType = StructType(Seq(
    StructField("top_ngram", StringType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))

  /**
   * Gopher repetition rules (Rae et al. 2021 §A1.1): over the document's
   * word n-grams (same positional construction as the n-gram oracle —
   * whole-doc gram when shorter than n tokens),
   *
   *  - `top_frac`: fraction of the document's characters covered by the
   *    most frequent n-gram — occurrences × gram length / text length,
   *    ties broken by lexicographically smallest gram;
   *  - `dup_frac`: the same coverage summed over every n-gram occurring
   *    more than once (overlaps counted per occurrence, so the value can
   *    exceed 1 on degenerate loops — callers threshold well below that).
   *
   * One in-row hash-map pass; exact integer counts with one fixed-shape
   * division each, so the DuckDB window-function oracle hash-matches.
   */
  def repetition(text: UTF8String, n: Int): InternalRow = {
    val s = text.toString
    val totalChars = codePoints(s)
    val toks = spaceTrim(s).split("\\s+", -1)
    val grams: Array[String] =
      if (toks.length < n) Array(toks.mkString(" "))
      else {
        val m = toks.length - n + 1
        val arr = new Array[String](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          arr(i) = sb.toString
          i += 1
        }
        arr
      }
    val counts = new java.util.HashMap[String, Int](grams.length * 2)
    grams.foreach(g => counts.merge(g, 1, Integer.sum))
    var topGram: String = null
    var topCnt = 0
    var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue.intValue()
      if (cnt > topCnt || (cnt == topCnt &&
          (topGram == null || compareCodePoints(e.getKey, topGram) < 0))) {
        topGram = e.getKey; topCnt = cnt
      }
      if (cnt >= 2) dupChars += cnt.toLong * codePoints(e.getKey)
    }
    val topFrac =
      if (totalChars > 0)
        round6(topCnt.toLong.toDouble * codePoints(topGram).toDouble / totalChars.toDouble)
      else 0.0
    val dupFrac =
      if (totalChars > 0) round6(dupChars.toDouble / totalChars.toDouble) else 0.0
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(topGram), topCnt.toLong, topFrac, dupFrac))
  }
}

/** `gopher_keep(text, minWords, maxWords)` → boolean —
  * see [[NativeQuality.gopherKeep]]. */
case class GopherKeep(child: Expression, minWords: Int, maxWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "gopher_keep"
  override protected def nullSafeEval(input: Any): Any =
    NativeQuality.gopherKeep(input.asInstanceOf[UTF8String], minWords, maxWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeQuality.gopherKeep($c, $minWords, $maxWords)")
  override protected def withNewChildInternal(newChild: Expression): GopherKeep =
    copy(child = newChild)
}

/** `repetition_metrics(text, n)` → struct — see [[NativeQuality.repetition]]. */
case class RepetitionMetrics(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = NativeQuality.repetitionSchema
  override def prettyName: String = "repetition_metrics"
  override protected def nullSafeEval(input: Any): Any =
    NativeQuality.repetition(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeQuality.repetition($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionMetrics =
    copy(child = newChild)
}

/** `quality_metrics(text)` → struct of the eight Gopher metrics —
  * see [[NativeQuality.metrics]]. */
case class QualityMetrics(child: Expression) extends UnaryExpression {
  override def dataType: DataType = NativeQuality.schema
  override def prettyName: String = "quality_metrics"
  override protected def nullSafeEval(input: Any): Any =
    NativeQuality.metrics(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeQuality.metrics($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityMetrics =
    copy(child = newChild)
}
