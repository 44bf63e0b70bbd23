package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class SearchSpec extends SparkTestBase {

  private lazy val docs = df("doc_id BIGINT, text STRING", Seq(
    Row(1L, "spark join spark"),
    Row(2L, "join sort"),
    Row(3L, "spark"),
    Row(4L, "the cat"),
    Row(5L, "")))

  private def q(rows: (Long, String)*) =
    df("query_id BIGINT, term STRING", rows.map(r => Row(r._1, r._2)))

  // Independent in-memory BM25 (plain Scala, same formula) for pinning.
  private def bm25(tf: Long, nT: Long, n: Long, dl: Long, avgdl: Double): Double = {
    val idf = math.log(1 + (n - nT + 0.5) / (nT + 0.5))
    idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
  }

  test("single-term query: shorter doc outranks longer at lower tf per BM25 length norm") {
    val out = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "spark"), k = 10)
      .orderBy("rank").collect()
    // N=5 docs, n_spark=2, dl: d1=3 d2=2 d3=1 d4=2, avgdl=2.0
    assert(out.map(_.getLong(2)).toSeq == Seq(3L, 1L))
    val expect3 = BigDecimal(bm25(1, 2, 5, 1, 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(0).getDouble(3) - expect3) < 1e-9)
  }

  test("multi-term query sums contributions; duplicate query terms count once") {
    val multi = Search.bm25TopK(docs, "doc_id", "text", q(2L -> "join", 2L -> "sort"), 10)
      .orderBy("rank").collect()
    assert(multi.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // d2 matches both terms
    val dup = Search.bm25TopK(docs, "doc_id", "text",
      q(3L -> "spark", 3L -> "spark"), 10).orderBy("rank").collect()
    val single = Search.bm25TopK(docs, "doc_id", "text", q(3L -> "spark"), 10)
      .orderBy("rank").collect()
    assert(dup.map(r => (r.getLong(2), r.getDouble(3))).toSeq ==
      single.map(r => (r.getLong(2), r.getDouble(3))).toSeq)
  }

  test("docs without any query term never appear; k caps the hit list") {
    val out = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "spark"), k = 1)
      .collect()
    assert(out.length == 1 && out(0).getLong(2) == 3L)
  }

  test("rrfFuse sums reciprocal ranks; one-sided candidates keep their single term") {
    import org.apache.spark.sql.Row
    def ranked(rows: (Long, Long, Long)*) =
      df("query_id BIGINT, rank BIGINT, doc_id BIGINT",
        rows.map { case (q, r, d) => Row(q, r, d) })
    val a = ranked((1L, 1L, 101L), (1L, 2L, 102L))
    val b = ranked((1L, 1L, 102L), (1L, 2L, 103L))
    val out = Search.rrfFuse(a, b, k = 10).orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    def rr(ranks: Long*) = {
      val x = ranks.map(r => 1.0 / (60 + r)).sum
      math.round(x * 1e9) / 1e9
    }
    // d102 appears in both (ranks 2 and 1); d101/d103 are one-sided
    assert(out.toSeq == Seq(
      101L -> rr(1), 102L -> rr(2, 1), 103L -> rr(2)).sortBy(-_._2))
  }

  test("plan: top-k pushes into the window, no cartesian beyond the 1-row stats") {
    val plan = Search.bm25TopK(docs, "doc_id", "text", q(1L -> "spark"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan) // rank filter pushed down
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop joins are the broadcast 1-row corpus-stats rides
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnl <= 2, s"unexpected nested-loop joins ($bnl):\n$plan")
  }
}
