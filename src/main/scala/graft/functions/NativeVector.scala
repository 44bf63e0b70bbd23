package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native random-hyperplane LSH signature (Charikar, STOC'02) over an
 * `array<double>` embedding: bit i = [dot(v, r_i) > 0] with r_i a
 * deterministic ±1 hyperplane derived from MurmurHash3(seed, i, dim).
 *
 * One imperative pass of nBits×dim multiply-adds per row, with the
 * hyperplane matrix built once per (seed, nBits, dim) and cached —
 * replaces a literal array-of-arrays + interpreted fold (~4096
 * expression-node evaluations per row at 64 bits × 64 dims).
 */
object NativeVector {

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
