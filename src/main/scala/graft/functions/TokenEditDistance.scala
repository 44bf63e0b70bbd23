package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `token_edit_distance(array<string>, array<string>) -> bigint`:
 * word-level Levenshtein distance (unit-cost substitution, insertion,
 * deletion) between two token arrays — the S+I+D numerator of WER
 * (word error rate), the canonical ASR / transcription-pipeline metric,
 * and of word-level TER.
 *
 * Native Catalyst `Expression` with `doGenCode` (static call, stays in
 * whole-stage codegen) — same discipline as [[LcsLength]]: the
 * O(|a|·|b|)-per-row DP runs on a two-row rolling buffer (O(min(n,m))
 * extra memory), and the plan shape is a pure projection — zero
 * shuffle, the corpus never moves. NULL array → NULL; NULL elements
 * equal nothing (so a null token always costs an edit, never a crash).
 */
// Note: no `ExpectsInputTypes` — `AbstractDataType` is private[sql] in
// Spark 4; input typing is enforced at the TextFunctions call site.
case class TokenEditDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_edit_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TokenEditDistance.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TokenEditDistance.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenEditDistance =
    copy(left = newLeft, right = newRight)
}

object TokenEditDistance {
  /** Static helper referenced from generated Java code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
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
    // Wagner–Fischer with one rolling row: dp(j) = dist(x[0..i], y[0..j])
    val dp = new Array[Int](m + 1)
    j = 0
    while (j <= m) { dp(j) = j; j += 1 }
    i = 0
    while (i < n) {
      var diag = dp(0) // dp[i-1][j-1]
      dp(0) = i + 1
      val xi = xs(i)
      j = 0
      while (j < m) {
        val above = dp(j + 1) // dp[i-1][j]
        val sub = if (xi != null && xi.equals(ys(j))) diag else diag + 1
        var best = sub
        if (above + 1 < best) best = above + 1 // deletion
        if (dp(j) + 1 < best) best = dp(j) + 1 // insertion
        dp(j + 1) = best
        diag = above
        j += 1
      }
      i += 1
    }
    dp(m).toLong
  }
}
