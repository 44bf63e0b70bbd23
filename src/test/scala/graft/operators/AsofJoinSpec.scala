package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class AsofJoinSpec extends SparkTestBase {

  // prices per key over time; events look up the last price at-or-before
  private lazy val events = df("ev_id INT, k STRING, ts INT", Seq(
    Row(1, "a", 5),   // before any price → no match
    Row(2, "a", 10),  // exactly at the 10 price row → matches it (>= rule)
    Row(3, "a", 17),  // between 10 and 20 → price@10
    Row(4, "a", 25),  // after 20 → price@20
    Row(5, "b", 30),  // other key → b's own price@12
    Row(6, "c", 9)))  // key with no right rows at all
  private lazy val prices = df("k STRING, pts INT, price DOUBLE, note STRING", Seq(
    Row("a", 10, 100.0, "open"),
    Row("a", 20, 120.0, null), // null payload FIELD must be preserved, not looked through
    Row("b", 12, 55.0, "b-open")))

  test("inner as-of: most recent right row at-or-before, per key; unmatched left dropped") {
    val out = AsofJoin.asofJoin(events, prices, Seq("k"), "ts", "pts",
      Seq("pts", "price", "note"), "inner")
      .orderBy("ev_id").collect()
      .map(r => (r.getInt(0), r.getInt(3), r.getDouble(4), r.getString(5)))
    assert(out.toSeq == Seq(
      (2, 10, 100.0, "open"),   // tie: right row at equal ts matches
      (3, 10, 100.0, "open"),
      (4, 20, 120.0, null),     // matched row's null field stays null
      (5, 12, 55.0, "b-open")))
  }

  test("left as-of keeps unmatched rows with null payload") {
    val out = AsofJoin.asofJoin(events, prices, Seq("k"), "ts", "pts",
      Seq("price"), "left")
      .orderBy("ev_id").collect()
      .map(r => (r.getInt(0), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (1, None), (2, Some(100.0)), (3, Some(100.0)),
      (4, Some(120.0)), (5, Some(55.0)), (6, None)))
  }

  test("plan: one exchange for the union+window, no cartesian/range join") {
    val out = AsofJoin.asofJoin(events, prices, Seq("k"), "ts", "pts",
      Seq("price"), "inner")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$plan")
  }

  test("matches DuckDB ASOF semantics on duplicate left timestamps") {
    // two left rows at the same ts both match the same right row
    val ev = df("ev_id INT, k STRING, ts INT", Seq(
      Row(1, "a", 15), Row(2, "a", 15)))
    val out = AsofJoin.asofJoin(ev, prices, Seq("k"), "ts", "pts",
      Seq("price"), "inner").collect().map(r => (r.getInt(0), r.getDouble(3))).toSet
    assert(out == Set((1, 100.0), (2, 100.0)))
  }
}
