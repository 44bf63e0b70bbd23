package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.sql.Timestamp

class FunnelSpec extends SparkTestBase {

  private def ts(s: Long) = Timestamp.from(java.time.Instant.ofEpochSecond(s))

  // u1: full ordered funnel; u2: click BEFORE view (order violated);
  // u3: view only; u4: view+click ordered, no purchase.
  private lazy val events = df("user_id BIGINT, ts TIMESTAMP, event_type STRING", Seq(
    Row(1L, ts(10), "view"), Row(1L, ts(20), "click"), Row(1L, ts(30), "purchase"),
    Row(2L, ts(50), "click"), Row(2L, ts(60), "view"),
    Row(3L, ts(70), "view"),
    Row(4L, ts(80), "view"), Row(4L, ts(85), "click"),
    Row(5L, ts(90), "purchase")))

  private val steps = Seq("view", "click", "purchase")

  test("conversion counts respect strict event order") {
    assertRowsInOrder(
      Funnel.conversion(events, "user_id", "ts", "event_type", steps)
        .orderBy("step"),
      Seq(Seq(1L, "view", 4L), Seq(2L, "click", 2L), Seq(3L, "purchase", 1L)))
  }

  test("earliest-next matching: a re-view after the click doesn't reset the funnel") {
    val ev2 = events.union(df("user_id BIGINT, ts TIMESTAMP, event_type STRING",
      Seq(Row(4L, ts(86), "view"), Row(4L, ts(87), "purchase"))))
    assertRowsInOrder(
      Funnel.conversion(ev2, "user_id", "ts", "event_type", steps).orderBy("step"),
      Seq(Seq(1L, "view", 4L), Seq(2L, "click", 2L), Seq(3L, "purchase", 2L)))
  }

  test("windowSeconds bounds the whole funnel from the first step") {
    // u1 completes at t=30, 20s after first view (t=10): a 15s window
    // keeps click (t=20) but cuts purchase; a 5s window cuts u1's click
    // too (u4's click at t1+5 stays — the bound is inclusive).
    val out15 = Funnel.conversion(events, "user_id", "ts", "event_type",
      steps, windowSeconds = Some(15L)).orderBy("step").collect()
    assert(out15.map(_.getLong(2)).toSeq == Seq(4L, 2L, 0L))
    val out5 = Funnel.conversion(events, "user_id", "ts", "event_type",
      steps, windowSeconds = Some(5L)).orderBy("step").collect()
    assert(out5.map(_.getLong(2)).toSeq == Seq(4L, 1L, 0L))
  }

  test("completions returns full-funnel users with their step times") {
    val out = Funnel.completions(events, "user_id", "ts", "event_type", steps)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L)
    assert(out(0).getTimestamp(1) == ts(10) && out(0).getTimestamp(3) == ts(30))
  }

  test("transitions: adjacent pairs per user, row-normalized; ties broken by id") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      Seq(
        Row(1L, ts(10), "view", 1L), Row(1L, ts(20), "click", 2L),
        Row(1L, ts(30), "view", 3L),
        // u2: same-timestamp pair — event_id orders click before view
        Row(2L, ts(40), "click", 4L), Row(2L, ts(40), "view", 5L)))
    val out = Funnel.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // from view: 1 transition (→click); from click: 2 (→view twice)
    assert(out(("view", "click")) == ((1L, 1.0)))
    assert(out(("click", "view")) == ((2L, 1.0)))
    assert(out.size == 2)
  }

  test("transitions: single-event users contribute nothing") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      Seq(Row(1L, ts(10), "view", 1L), Row(2L, ts(20), "click", 2L)))
    assert(Funnel.transitions(ev, "user_id", "ts", "event_type", "event_id")
      .collect().isEmpty)
  }
}
