package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `simhash64(array<bigint>) -> bigint`: Charikar SimHash over pre-hashed
 * tokens (Charikar, STOC'02). Bit p of the result is 1 iff the sum of
 * (+1 / -1) votes from bit p of each token hash is positive.
 *
 * Implemented as a native Catalyst `Expression` with `doGenCode` (a static
 * call, so it stays inside whole-stage codegen) rather than a Scala UDF —
 * the hot path of a 100 TB dedup scan. Null elements are ignored; a null
 * array yields null.
 *
 * Pair with `bit_count(a ^ b)` (built-in) for Hamming distance, and with
 * 16-bit band bucketing for LSH candidate generation (see
 * graft.operators.Dedup.simhashPairs).
 */
// Note: no `ExpectsInputTypes` — `AbstractDataType` is private[sql] in
// Spark 4, so input typing is enforced by the sole call site
// (GraftSession.simhash64 always passes array<bigint>).
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static helper referenced from generated Java code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var p = 0
        while (p < 64) {
          if (((h >>> p) & 1L) == 1L) counts(p) += 1 else counts(p) -= 1
          p += 1
        }
      }
      i += 1
    }
    var out = 0L
    var p = 0
    while (p < 64) {
      if (counts(p) > 0) out |= (1L << p)
      p += 1
    }
    out
  }
}
