package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `clipped_overlap(array<string>, array<string>) -> bigint`: the clipped
 * multiset-intersection size Σ_t min(count_left(t), count_right(t)) —
 * the numerator shared by token-F1 (Rajpurkar 2016), ROUGE-N (Lin
 * 2004), BLEU's modified n-gram precision (Papineni 2002) and chrF
 * (Popović 2015), where both sides of the comparison live on the SAME
 * row.
 *
 * Native Catalyst `Expression` with `doGenCode` (static call, stays in
 * whole-stage codegen). This replaces the r9 explode → (id, gram)
 * groupBy ×2 → join → groupBy pipeline those metrics shared: the value
 * per row is identical (both compute Σ min of per-gram multiplicities;
 * grams absent from either side contribute min(·,0) = 0), but the plan
 * becomes a pure projection — ZERO shuffles instead of three, and at
 * 100 TB the corpus' n-grams never cross the network (guide §2.4:
 * remove shuffles outright). Cost is O(|a| + |b|) per row via one
 * open-addressing hash table over the smaller side — not the O(L²)
 * filter-scan the r7 scaladoc rightly rejected.
 *
 * NULL array → NULL (callers coalesce to 0, matching the old left-join
 * + coalesce). NULL elements match nothing — explode produced a NULL
 * gram row whose inner equi-join on the gram could never match.
 */
case class ClippedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "clipped_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ClippedOverlap.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ClippedOverlap.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClippedOverlap =
    copy(left = newLeft, right = newRight)
}

object ClippedOverlap {
  /** Static helper referenced from generated Java code: builds counts
    * of the SMALLER array in an open-addressing table, then drains with
    * the larger — each drain hit decrements a positive count and scores
    * 1, which telescopes to Σ_t min(countA(t), countB(t)). */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val (small, nSmall, big, nBig) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    // open addressing, power-of-two capacity ≥ 2·nSmall
    var cap = 8
    while (cap < nSmall * 2) cap <<= 1
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val counts = new Array[Int](cap)
    var i = 0
    while (i < nSmall) {
      if (!small.isNullAt(i)) {
        val k = small.getUTF8String(i)
        var slot = k.hashCode() & mask
        while (keys(slot) != null && !keys(slot).equals(k))
          slot = (slot + 1) & mask
        if (keys(slot) == null) keys(slot) = k
        counts(slot) += 1
      }
      i += 1
    }
    var overlap = 0L
    i = 0
    while (i < nBig) {
      if (!big.isNullAt(i)) {
        val k = big.getUTF8String(i)
        var slot = k.hashCode() & mask
        while (keys(slot) != null && !keys(slot).equals(k))
          slot = (slot + 1) & mask
        if (keys(slot) != null && counts(slot) > 0) {
          counts(slot) -= 1
          overlap += 1L
        }
      }
      i += 1
    }
    overlap
  }
}
