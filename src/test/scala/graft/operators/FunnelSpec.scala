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

  test("topPaths: truncation, counting, and deterministic rank ties") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      Seq(
        // u1 and u2: view>click; u3: view>click>buy truncated at 2
        Row(1L, ts(10), "view", 1L), Row(1L, ts(20), "click", 2L),
        Row(2L, ts(30), "view", 3L), Row(2L, ts(40), "click", 4L),
        Row(3L, ts(50), "view", 5L), Row(3L, ts(60), "click", 6L),
        Row(3L, ts(70), "buy", 7L),
        // u4: lone view; u5: click>view (distinct from view>click)
        Row(4L, ts(80), "view", 8L),
        Row(5L, ts(90), "click", 9L), Row(5L, ts(90), "view", 10L)))
    val out = Funnel.topPaths(ev, "user_id", "ts", "event_id",
      "event_type", maxSteps = 2, k = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("view>click", 2, 3L, 1L),       // u1, u2, u3 (truncated)
      ("click>view", 2, 1L, 2L),       // tie at n=1 -> path asc
      ("view", 1, 1L, 3L)))
  }

  test("topPaths: same-timestamp events order by the tie column") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      Seq(Row(1L, ts(10), "b", 2L), Row(1L, ts(10), "a", 1L)))
    val out = Funnel.topPaths(ev, "user_id", "ts", "event_id",
      "event_type", maxSteps = 5, k = 5).collect()
    assert(out(0).getString(0) == "a>b")
  }

  test("topPaths: k cuts after the (n desc, path asc) order") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      (1 to 3).map(u => Row(u.toLong, ts(u * 10L), s"e$u", u.toLong)))
    val out = Funnel.topPaths(ev, "user_id", "ts", "event_id",
      "event_type", maxSteps = 5, k = 2)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("e1", "e2"))
  }

  test("frequentSequences: user support vs occurrences, rank ties by seq") {
    def u(id: Long, t0: Long, types: String*) = types.zipWithIndex.map {
      case (t, i) => Row(id, ts(t0 + i * 10), t, t0 + i)
    }
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      u(1L, 100, "a", "b", "c", "d") ++    // a>b>c, b>c>d
        u(2L, 200, "a", "b", "c") ++       // a>b>c
        u(3L, 300, "a", "b", "c", "a", "b", "c")) // a>b>c x2, b>c>a, c>a>b
    val out = Funnel.frequentSequences(ev, "user_id", "ts", "event_id",
      "event_type", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      ("a>b>c", 3L, 4L, 1L),
      ("b>c>a", 1L, 1L, 2L),
      ("b>c>d", 1L, 1L, 3L),
      ("c>a>b", 1L, 1L, 4L)))
  }

  test("frequentSequences: NULL types drop before pairing; short users vanish") {
    val ev = df("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT",
      Seq(Row(1L, ts(10), "a", 1L), Row(1L, ts(20), null, 2L),
        Row(1L, ts(30), "b", 3L),
        Row(2L, ts(40), "x", 4L)))
    val out = Funnel.frequentSequences(ev, "user_id", "ts", "event_id",
      "event_type", n = 2, k = 10).collect()
    // the NULL row is removed, so a and b become adjacent
    assert(out.map(_.getString(0)).toSeq == Seq("a>b"))
  }
}
