package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `jaro_winkler(string, string) -> double`: Jaro-Winkler similarity
 * (Jaro 1989; Winkler 1990) — the record-linkage string comparator for
 * SHORT fields (person/org names) where a shared prefix is strong
 * evidence: Jaro's match/transposition score, boosted by up to 4
 * common-prefix characters at p = 0.1 ONLY when Jaro > 0.7 (the
 * standard boost threshold).
 *
 * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the gate's
 * oracle), probed empirically: either side empty → 0.0 (including
 * both-empty), match window ⌊max(|a|,|b|)/2⌋−1 (so 2-char reversals
 * score 0), transpositions = half the mismatched matched-pair count,
 * prefix capped at 4, boost gated on jaro > 0.7.
 *
 * Native codegen'd expression — pairwise scoring sits inside blocked-
 * linkage joins (Linkage / sortedNeighborhoodPairs output), so it must
 * stay in whole-stage codegen; O(|a|·|b|) per row worst case with a
 * |b|-sized scratch bitset, no shuffle of its own.
 */
// Note: no `ExpectsInputTypes` — `AbstractDataType` is private[sql] in
// Spark 4; input typing is enforced at TextFunctions.jaroWinkler.
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Static helper referenced from generated Java code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: matched chars read off in order, count diffs
    var halfT = 0
    var j = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) halfT += 1
        j += 1
      }
      i += 1
    }
    val t = halfT / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
