package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `lcs_length(array<string>, array<string>) -> bigint`: length of the
 * longest common subsequence of two token arrays — the core of ROUGE-L
 * (Lin 2004), where in-order token matches need not be contiguous.
 *
 * Native Catalyst `Expression` with `doGenCode` (static call, stays in
 * whole-stage codegen) — ROUGE-L is inherently O(|a|·|b|) PER ROW, so
 * the implementation is a two-row rolling DP (O(min) extra memory, no
 * allocation proportional to the product) and the plan shape is a pure
 * projection: zero shuffle, the corpus never moves. NULL array → NULL;
 * NULL elements match nothing (tokens from `split` are never null, but
 * schema-drifted inputs must not crash the scan).
 */
// Note: no `ExpectsInputTypes` — `AbstractDataType` is private[sql] in
// Spark 4; input typing is enforced at the TextFunctions.lcsLength call
// site (always two array<string> token columns).
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LcsLength.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Static helper referenced from generated Java code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0L
    val xs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      xs(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    val ys = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      ys(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    // classic LCS DP, one rolling row over b: dp(j) = LCS(x[0..i], y[0..j])
    val dp = new Array[Int](m + 1)
    i = 0
    while (i < n) {
      var diag = 0 // dp[i-1][j-1]
      val xi = xs(i)
      j = 0
      while (j < m) {
        val above = dp(j + 1) // dp[i-1][j]
        dp(j + 1) =
          if (xi != null && xi.equals(ys(j))) diag + 1
          else if (dp(j + 1) >= dp(j)) dp(j + 1)
          else dp(j)
        diag = above
        j += 1
      }
      i += 1
    }
    dp(m).toLong
  }
}
