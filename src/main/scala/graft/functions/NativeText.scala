package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass text-hashing expressions for the dedup hot path.
 *
 * The composable Column versions (TextFunctions.wordShingles + transform +
 * xxhash64 + array_distinct) are correct but evaluate as INTERPRETED
 * higher-order-function trees: the token array is re-split per lambda
 * iteration and every slice/join allocates — ~10 ms/document. These
 * expressions do the same work in one imperative pass (~5 µs/document),
 * producing IDENTICAL hash values (Spark's XXH64, seed 42, over the same
 * shingle strings), so they are drop-in replacements.
 *
 * All values match `functions.xxhash64` exactly:
 *   hash(s)            == xxhash64(s)
 *   minhash row i uses    xxhash64(lit(i), h) == hashLong(h, hashInt(i, 42))
 */
object NativeText {
  private final val Seed = 42L

  /** xxhash64-identical hash of one string. */
  def hashString(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), Seed)

  /** Tokens exactly as `split(trim(text), "\\s+")` produces them in
    * Spark SQL: SPACE-only trim (Java's String.trim also strips \t, \n
    * and all controls ≤ U+0020 — a divergence from the Column
    * formulations and the DuckDB oracles) and limit -1 (Spark keeps
    * trailing empty tokens; Java's default limit 0 drops them). */
  private def sparkTokens(s: String): Array[String] = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to).split("\\s+", -1)
  }

  /** Word n-gram shingle hashes of `text` (whitespace tokens of the
    * trimmed string); `distinct` keeps first occurrence order. Documents
    * shorter than n tokens yield one whole-document shingle — identical
    * to TextFunctions.wordShingles. */
  def shingleHashes(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = sparkTokens(text.toString)
    val out =
      if (toks.length < n) Array(hashString(toks.mkString(" ")))
      else {
        val m = toks.length - n + 1
        val arr = new Array[Long](m)
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
          arr(i) = hashString(sb.toString)
          i += 1
        }
        arr
      }
    if (!distinct) new GenericArrayData(out)
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long](out.length * 2)
      out.foreach(seen.add(_))
      val dedup = new Array[Long](seen.size)
      val it = seen.iterator()
      var i = 0
      while (it.hasNext) { dedup(i) = it.next(); i += 1 }
      new GenericArrayData(dedup)
    }
  }

  /** Word n-gram shingle STRINGS (non-distinct, positional) — the
    * corpus-stats variant where the gram text itself is the output.
    * Identical shingle construction to [[shingleHashes]] (so
    * `xxhash64(string_shingles(t)(i)) == hashed_shingles(t)(i)`) and
    * value-identical to the wordShingles HOF formulation (spec-pinned). */
  def stringShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = sparkTokens(text.toString)
    val out: Array[Any] =
      if (toks.length < n) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val m = toks.length - n + 1
        val arr = new Array[Any](m)
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
          arr(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        arr
      }
    new GenericArrayData(out)
  }

  /** Whitespace-token hashes (non-distinct) — SimHash input. */
  def tokenHashes(text: UTF8String): ArrayData = {
    val toks = sparkTokens(text.toString)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = hashString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /**
   * Winnowing (Schleimer et al., SIGMOD'03) over positional shingle
   * hashes: min of each sliding window of `w`, then distinct preserving
   * first occurrence — value-identical to the slice/array_min HOF
   * formulation in TextFunctions (spec-pinned) in one imperative pass.
   */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val hashes = shingleHashes(text, k, distinct = false)
    val n = hashes.numElements()
    val nWin = n - (w - 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](16)
    if (nWin <= 0) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) { val h = hashes.getLong(i); if (h < min) min = h; i += 1 }
      seen.add(min)
    } else {
      var i = 0
      while (i < nWin) {
        var min = Long.MaxValue
        var j = 0
        while (j < w) { val h = hashes.getLong(i + j); if (h < min) min = h; j += 1 }
        seen.add(min)
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Unicode NFC normalization (UAX #15, java.text.Normalizer) — canonical
    * composition so visually-identical text hashes identically (a
    * decomposed `e`+U+0301 and a composed `é` are DIFFERENT bytes to
    * every dedup/fingerprint operator above). Already-normalized input —
    * the overwhelmingly common case — is detected with the quick-check
    * and returned without allocating. NFC is a stable, engine-portable
    * spec: DuckDB's utf8proc `nfc_normalize` produces identical bytes
    * (the q_text_nfc oracle). */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** k permutation min-hashes over pre-hashed shingles; row i's permutation
    * is h → xxhash64(i, h). Empty in → empty out (callers filter empties). */
  def minhashSignature(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val rowSeed = XXH64.hashInt(i, Seed)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(hashes.getLong(j), rowSeed)
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Field layout of [[scriptCounts]] — mirrors
    * TextFunctions.scriptProfileHof's struct exactly. */
  val scriptSchema: StructType = StructType(
    Seq("latin", "digit", "space", "cjk", "cyrillic", "arabic", "other")
      .map(StructField(_, DoubleType, nullable = false)))

  /** Spark's round(x, 6): BigDecimal HALF_UP at scale 6. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * One-pass character-class fractions (TextFunctions.scriptProfile):
   * the HOF formulation runs SEVEN regexp_replace passes over the text;
   * this walks the codepoints once. Class ranges are bit-identical to
   * the portable regex classes ([[TextFunctions.scriptRanges]]), counts
   * are codepoint counts (what both engines' `length()` returns), and
   * fractions use the same int→double promotion + round(,6).
   */
  def scriptCounts(text: UTF8String): InternalRow = {
    val s = text.toString
    var latin, digit, space, cjk, cyr, ar, other, n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) latin += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') space += 1
      else if ((cp >= 0x4e00 && cp <= 0x9fff) || (cp >= 0x3040 && cp <= 0x30ff)) cjk += 1
      else if (cp >= 0x0400 && cp <= 0x04ff) cyr += 1
      else if (cp >= 0x0600 && cp <= 0x06ff) ar += 1
      else other += 1
    }
    def f(c: Int): Double = if (n > 0) round6(c.toDouble / n.toDouble) else 0.0
    new GenericInternalRow(Array[Any](
      f(latin), f(digit), f(space), f(cjk), f(cyr), f(ar), f(other)))
  }

  /**
   * Simpson diversity 1 − Σp² in one pass: per-distinct counts in a hash
   * map, Σn² in INTEGER space, exactly one float division + round6 at
   * the end — bit-identical to TextFunctions.simpsonDiversity's
   * transform/filter formulation (spec-pinned) without its
   * O(|distinct|·|items|) interpreted-HOF cost.
   */
  private def simpson(counts: java.util.Collection[java.lang.Long],
                      n: Long): Double = {
    if (n == 0L) return 0.0
    var sumSq = 0L
    val it = counts.iterator()
    while (it.hasNext) { val c = it.next().longValue(); sumSq += c * c }
    round6(1.0 - sumSq.toDouble / (n.toDouble * n.toDouble))
  }

  /** Character (code-point) Simpson diversity — `length`/`substr` count
    * code points, so iteration is by code point too. Empty → 0. */
  def simpsonChars(text: UTF8String): Double = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, java.lang.Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    simpson(counts.values, n)
  }

  /** Whitespace-token Simpson diversity; empty text yields the single
    * empty token (split semantics), hence diversity 0. */
  def simpsonTokens(text: UTF8String): Double = {
    val toks = sparkTokens(text.toString)
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b)
      i += 1
    }
    simpson(counts.values, toks.length.toLong)
  }

  /** Engine-portable polynomial hash: fold (h·31 + codepoint) mod
    * 2000003 over the string's code points, then mod `buckets`. The
    * modulus is a prime ABOVE 0x10FFFF so the first code point is
    * already < M — DuckDB's seedless `list_reduce` (first element as
    * accumulator) and this 0-seeded fold then agree from step one,
    * making the bucket ids reproducible in plain SQL on any engine. */
  private final val PolyMod = 2000003L

  private def polyBucket(s: String, buckets: Int): Int = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % PolyMod
      i += Character.charCount(cp)
    }
    (h % buckets).toInt
  }

  /** DSIR hashed features of one document: bucket ids of every
    * whitespace token (unigrams) followed by every adjacent token pair
    * joined with a single space (bigrams) — 2n−1 ints for n tokens,
    * empty tokens dropped. One pass, no string re-allocation beyond the
    * bigram join. */
  def dsirBuckets(text: UTF8String, buckets: Int): ArrayData = {
    val toks = sparkTokens(text.toString).filter(_.nonEmpty)
    val n = toks.length
    val out = new Array[Int](if (n == 0) 0 else 2 * n - 1)
    var i = 0
    while (i < n) { out(i) = polyBucket(toks(i), buckets); i += 1 }
    i = 0
    while (i < n - 1) {
      out(n + i) = polyBucket(toks(i) + " " + toks(i + 1), buckets)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `hashed_shingles(text)` → array<bigint> — see [[NativeText.shingleHashes]]. */
case class HashedShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_shingles"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.shingleHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeText.shingleHashes($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)
}

/** `string_shingles(text)` → array<string> — see [[NativeText.stringShingles]]. */
case class StringShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "string_shingles"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.stringShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeText.stringShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): StringShingles =
    copy(child = newChild)
}

/** `hashed_tokens(text)` → array<bigint> — see [[NativeText.tokenHashes]]. */
case class HashedTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_tokens"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.tokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.tokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): HashedTokens =
    copy(child = newChild)
}

/** `winnowed_fingerprints(text)` → array<bigint> — see [[NativeText.winnow]]. */
case class WinnowedFps(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowedFps =
    copy(child = newChild)
}

/** `script_profile(text)` → struct of character-class fractions —
  * see [[NativeText.scriptCounts]]. */
case class ScriptProfile(child: Expression) extends UnaryExpression {
  override def dataType: DataType = NativeText.scriptSchema
  override def prettyName: String = "script_profile"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.scriptCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.scriptCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): ScriptProfile =
    copy(child = newChild)
}

/** `nfc_normalize(text)` → string — see [[NativeText.nfc]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `simpson_chars(text)` → double — see [[NativeText.simpsonChars]]. */
case class SimpsonChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "simpson_chars"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.simpsonChars(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.simpsonChars($c)")
  override protected def withNewChildInternal(newChild: Expression): SimpsonChars =
    copy(child = newChild)
}

/** `simpson_tokens(text)` → double — see [[NativeText.simpsonTokens]]. */
case class SimpsonTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "simpson_tokens"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.simpsonTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.simpsonTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): SimpsonTokens =
    copy(child = newChild)
}

/** `dsir_buckets(text, B)` → array<int> — see [[NativeText.dsirBuckets]]. */
case class DsirBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dsir_buckets"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.dsirBuckets(input.asInstanceOf[UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.dsirBuckets($c, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** `minhash_sig(array<bigint>)` → array<bigint> of k permutation minima. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    NativeText.minhashSignature(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.minhashSignature($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
