package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/**
 * Native vector primitives over `array<double>` embeddings.
 *
 * Array higher-order built-ins (`zip_with` + `aggregate`) evaluate their
 * lambdas interpreted — measured ~1000× slower than a fused loop on the
 * ANN hot path (see SCALING.md). Each primitive here is one imperative
 * pass, called from codegen'd expressions below.
 *
 * FP determinism: every reduction is a sequential left-fold in element
 * order, bit-identical to the higher-order-function formulations in
 * [[VectorFunctions]] (pinned by VectorFunctionsSpec), so swapping the
 * implementations cannot change results.
 */
object NativeVector {

  /** Sequential left-fold dot product (deterministic across runs).
    * Callers guarantee equal lengths — the expressions below return NULL
    * on mismatch BEFORE calling in, matching the zip_with padding
    * semantics of the HOF formulations. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val na = math.sqrt(daa); val nb = math.sqrt(dbb)
    if (na == 0.0 || nb == 0.0) 0.0 else dab / (na * nb)
  }

  def l2Dist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  /** ±1 component for hyperplane i, dimension d (flattened row-major). */
  private def planes(seed: Long, nBits: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((seed, nBits, dim), { case (s, nb, dm) =>
      val arr = new Array[Double](nb * dm)
      var i = 0
      while (i < nb) {
        var d = 0
        while (d < dm) {
          val h = scala.util.hashing.MurmurHash3.productHash((s, i, d))
          arr(i * dm + d) = if ((h & 1) == 0) 1.0 else -1.0
          d += 1
        }
        i += 1
      }
      arr
    })

  def signature(vec: ArrayData, nBits: Int, seed: Long): Long = {
    val dim = vec.numElements()
    if (dim == 0) return 0L
    val p = planes(seed, nBits, dim)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getDouble(d); d += 1 }
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var dot = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) { dot += v(j) * p(off + j); j += 1 }
      if (dot > 0.0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /**
   * Wide banded signature: `bands` LSH band keys of `bandBits` bits each
   * (total bands×bandBits hyperplanes — not capped at 64). Key j packs the
   * signs of hyperplanes [j·bandBits, (j+1)·bandBits). Wider keys = more
   * buckets per band = fewer accidental candidate collisions: 16-bit keys
   * give 65,536 buckets/band where the round-1 4-bit keys gave 16 (which
   * made every pair a candidate — the q_dedup_embed quadratic blowup).
   */
  def bandKeys(vec: ArrayData, bands: Int, bandBits: Int, seed: Long): ArrayData = {
    val dim = vec.numElements()
    val keys = new Array[Long](bands)
    if (dim == 0) return new GenericArrayData(keys)
    val total = bands * bandBits
    val p = planes(seed, total, dim)
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) { v(d) = vec.getDouble(d); d += 1 }
    var i = 0
    while (i < total) {
      var dot = 0.0
      val off = i * dim
      var j = 0
      while (j < dim) { dot += v(j) * p(off + j); j += 1 }
      if (dot > 0.0) keys(i / bandBits) |= (1L << (i % bandBits))
      i += 1
    }
    new GenericArrayData(keys)
  }

  /**
   * Indices of the `n` centroids nearest to `vec` by cosine, descending
   * (ties → lower cell id). Centroids arrive L2-normalized and flattened
   * row-major, so argmax cosine ≡ argmax dot — one fused pass, no
   * normalization of the input vector needed (cosine is scale-invariant
   * and |v| is constant across cells).
   */
  def nearestCells(vec: ArrayData, flat: Array[Double], k: Int, n: Int): ArrayData = {
    val dim = if (k == 0) 0 else flat.length / k
    val m = math.min(n, k)
    val dots = new Array[Double](k)
    val vd = math.min(vec.numElements(), dim)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var j = 0
      while (j < vd) { acc += vec.getDouble(j) * flat(off + j); j += 1 }
      dots(c) = acc
      c += 1
    }
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      // seed with the first untaken cell so an all-NaN dot vector (NaN
      // components in the input) degrades to cell order instead of
      // indexing taken(-1)
      var best = -1
      var bestDot = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && (best == -1 || dots(i) > bestDot)) {
          best = i; bestDot = dots(i)
        }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /**
   * Index of the single centroid nearest to `vec` by SQUARED L2
   * distance (ties → lower index; strict `<` keeps the first minimum) —
   * the PQ code-assignment kernel. The distance is the raw sequential
   * fold Σ(xⱼ−cⱼ)² in ascending j — bit-identical to a DuckDB
   * list_reduce replay, so assignment is cross-engine exact without any
   * rounding. A vector shorter than the centroid dim compares only its
   * prefix (mirrors [[nearestCells]]' clamped loop).
   */
  def nearestCellL2(vec: ArrayData, flat: Array[Double], k: Int): Int = {
    val dim = if (k == 0) 0 else flat.length / k
    val vd = math.min(vec.numElements(), dim)
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      val off = c * dim
      var j = 0
      while (j < vd) {
        val d = vec.getDouble(j) - flat(off + j)
        acc += d * d
        j += 1
      }
      if (best == -1 || acc < bestD) { best = c; bestD = acc }
      c += 1
    }
    best
  }
}

/** `hyperplane_sig(array<double>)` → bigint; see [[NativeVector.signature]]. */
case class HyperplaneSig(child: Expression, nBits: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64)
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override protected def nullSafeEval(input: Any): Any =
    NativeVector.signature(input.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeVector.signature($c, $nBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** `band_keys(array<double>)` → array<bigint>; see [[NativeVector.bandKeys]]. */
case class BandKeys(child: Expression, bands: Int, bandBits: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(bands >= 1 && bandBits >= 1 && bandBits <= 63)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_keys"
  override protected def nullSafeEval(input: Any): Any =
    NativeVector.bandKeys(input.asInstanceOf[ArrayData], bands, bandBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeVector.bandKeys($c, $bands, $bandBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/**
 * `nearest_cells(array<double>)` → array<int>: the `n` nearest of `k`
 * unit-normalized centroids by cosine, descending (see
 * [[NativeVector.nearestCells]]). The centroid matrix (flattened
 * row-major) rides along as a referenced object in codegen — computed
 * once on the driver, broadcast with the task binary, zero per-row setup.
 */
case class NearestCells(child: Expression, centroidsFlat: Seq[Double],
                        k: Int, n: Int) extends UnaryExpression {
  require(k >= 1 && n >= 1 && centroidsFlat.length % k == 0)
  @transient private lazy val flat: Array[Double] = centroidsFlat.toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  override protected def nullSafeEval(input: Any): Any =
    NativeVector.nearestCells(input.asInstanceOf[ArrayData], flat, k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeVector.nearestCells($c, $matRef, $k, $n)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

/**
 * `nearest_cell_l2(array<double>)` → int: the index of the nearest of
 * `k` centroids by squared L2 distance (see
 * [[NativeVector.nearestCellL2]]) — the PQ code-assignment expression.
 * Same literal-matrix discipline as [[NearestCells]]: the flattened
 * codebook rides as a codegen reference object, zero per-row setup.
 */
case class NearestCellL2(child: Expression, centroidsFlat: Seq[Double],
                         k: Int) extends UnaryExpression {
  require(k >= 1 && centroidsFlat.nonEmpty && centroidsFlat.length % k == 0)
  @transient private lazy val flat: Array[Double] = centroidsFlat.toArray
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell_l2"
  override protected def nullSafeEval(input: Any): Any =
    NativeVector.nearestCellL2(input.asInstanceOf[ArrayData], flat, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NativeVector.nearestCellL2($c, $matRef, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellL2 =
    copy(child = newChild)
}

/** Base for binary vector ops: NULL on length mismatch — exactly what
  * the `zip_with`-based HOF formulations produce (the shorter side pads
  * with nulls, poisoning the fold), so native and HOF stay value-
  * identical even on malformed inputs (schema-drifted embeddings). */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def staticCall: String
  protected def compute(a: ArrayData, b: ArrayData): Double
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]; val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null else compute(aa, bb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else { ${ev.value} = $staticCall($a, $b); }""".stripMargin)
}

/** `native_dot(a, b)` → double, sequential left-fold order. */
case class NativeDot(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "native_dot"
  override protected val staticCall = "graft.functions.NativeVector.dot"
  override protected def compute(a: ArrayData, b: ArrayData): Double = NativeVector.dot(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeDot =
    copy(left = newLeft, right = newRight)
}

/** `native_cosine(a, b)` → double; 0.0 on zero-norm input. */
case class NativeCosine(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "native_cosine"
  override protected val staticCall = "graft.functions.NativeVector.cosine"
  override protected def compute(a: ArrayData, b: ArrayData): Double = NativeVector.cosine(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeCosine =
    copy(left = newLeft, right = newRight)
}

/** `native_l2_distance(a, b)` → double. */
case class NativeL2Distance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "native_l2_distance"
  override protected val staticCall = "graft.functions.NativeVector.l2Dist"
  override protected def compute(a: ArrayData, b: ArrayData): Double = NativeVector.l2Dist(a, b)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NativeL2Distance =
    copy(left = newLeft, right = newRight)
}
