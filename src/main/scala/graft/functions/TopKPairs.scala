package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate: `topk_pairs(score, id, k)` keeps the k best
 * `(score, id)` pairs per group in a size-k min-heap and emits them as
 * `array<struct<score double, id bigint>>` sorted (score desc, id asc).
 *
 * This is the scale-correct alternative to the `row_number()` window
 * for "top k per key": the window plans a FULL sort of every key's
 * rows (a 10⁹-row key sorts 10⁹ rows to keep 5), while this aggregate
 * carries at most k entries per group through both the partial and
 * final aggregation — map-side combine bounds the shuffle at
 * k·partitions rows per key, and no sort ever exceeds k·log k work
 * per group. The trade is imperative (non-codegen) aggregation,
 * which only touches the aggregation operator itself — the scan and
 * projections around it stay in whole-stage codegen.
 *
 * Determinism: ties on score resolve to the SMALLER id (the same
 * total order as `Sample.topPerKey`'s `(score desc, id asc)` window,
 * so the two formulations are row-for-row equal); NULL scores and
 * NULL ids are skipped (pre-coalesce upstream if nulls must rank).
 * The heap's eviction order is a pure function of the pair set, so
 * partition order cannot change the result.
 */
case class TopKPairs(scoreChild: Expression, idChild: Expression, k: Int,
                     override val mutableAggBufferOffset: Int = 0,
                     override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[TopKPairs.Entry]] {
  require(k >= 1, s"k must be >= 1, got $k")

  import TopKPairs.Entry

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)
  override def prettyName: String = "topk_pairs"

  // head of the queue = the WORST kept entry (lowest score; among equal
  // scores the largest id), i.e. the eviction candidate
  private def worstFirst: java.util.Comparator[Entry] =
    (a: Entry, b: Entry) =>
      if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
      else java.lang.Long.compare(b.id, a.id)

  override def createAggregationBuffer(): java.util.PriorityQueue[Entry] =
    new java.util.PriorityQueue[Entry](k + 1, worstFirst)

  private def offer(pq: java.util.PriorityQueue[Entry], e: Entry): Unit =
    if (pq.size < k) pq.add(e)
    else {
      val worst = pq.peek()
      val better = e.score > worst.score ||
        (e.score == worst.score && e.id < worst.id)
      if (better) { pq.poll(); pq.add(e) }
    }

  override def update(pq: java.util.PriorityQueue[Entry],
                      input: InternalRow): java.util.PriorityQueue[Entry] = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null)
      offer(pq, Entry(s.asInstanceOf[Double], i.asInstanceOf[Long]))
    pq
  }

  override def merge(pq: java.util.PriorityQueue[Entry],
                     other: java.util.PriorityQueue[Entry])
      : java.util.PriorityQueue[Entry] = {
    val it = other.iterator()
    while (it.hasNext) offer(pq, it.next())
    pq
  }

  override def eval(pq: java.util.PriorityQueue[Entry]): Any = {
    val arr = new Array[Entry](pq.size)
    pq.toArray(arr)
    java.util.Arrays.sort(arr, worstFirst.reversed())
    new GenericArrayData(arr.map { e =>
      new GenericInternalRow(Array[Any](e.score, e.id))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(pq: java.util.PriorityQueue[Entry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + pq.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(pq.size)
    val it = pq.iterator()
    while (it.hasNext) {
      val e = it.next(); out.writeDouble(e.score); out.writeLong(e.id)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[Entry] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val pq = createAggregationBuffer()
    var i = 0
    while (i < n) { pq.add(Entry(in.getDouble, in.getLong)); i += 1 }
    pq
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreChild = newChildren(0), idChild = newChildren(1))
}

object TopKPairs {
  final case class Entry(score: Double, id: Long)
}
