package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class RollingSpec extends SparkTestBase {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("trailingAgg: inclusive trailing window, per key, ties are peers") {
    val events = df("user_id BIGINT, ts TIMESTAMP, value DOUBLE", Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1.0),
      Row(1L, ts("2024-01-01 10:30:00"), 2.0),
      Row(1L, ts("2024-01-01 11:00:00"), 4.0),  // 10:00 still inside [10:00, 11:00]
      Row(1L, ts("2024-01-01 12:30:00"), 8.0),  // everything else aged out
      Row(1L, ts("2024-01-01 12:30:00"), 16.0), // tie: peer of the row above
      Row(2L, ts("2024-01-01 10:15:00"), 100.0)))
    val out = Rolling.trailingAgg(events, "user_id", "ts", "value", 3600L)
      .select("user_id", "ts", "value", "n_window", "sum_window")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", 1.0, 1L, 1.0),
      (1L, "2024-01-01 10:30:00.0", 2.0, 2L, 3.0),
      (1L, "2024-01-01 11:00:00.0", 4.0, 3L, 7.0),
      (1L, "2024-01-01 12:30:00.0", 8.0, 2L, 24.0),   // both tied rows…
      (1L, "2024-01-01 12:30:00.0", 16.0, 2L, 24.0),  // …see each other (RANGE peers)
      (2L, "2024-01-01 10:15:00.0", 100.0, 1L, 100.0)))
  }

  test("keyedNav: gaps, lookahead, and deterministic tie order") {
    val events = df("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, value DOUBLE", Seq(
      Row(1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      Row(2L, 1L, ts("2024-01-01 10:00:10"), 2.0),
      Row(4L, 1L, ts("2024-01-01 10:01:00"), 4.0),  // tie on ts with #3…
      Row(3L, 1L, ts("2024-01-01 10:01:00"), 3.0),  // …event_id breaks it: 3 before 4
      Row(9L, 2L, ts("2024-01-01 12:00:00"), 9.0)))
    val out = Rolling.keyedNav(events, "user_id", "ts", "event_id", "value")
      .select("event_id", "rn", "gap_micros", "next_value")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      (1L, 1, None, Some(2.0)),
      (2L, 2, Some(10000000L), Some(3.0)),
      (3L, 3, Some(50000000L), Some(4.0)),  // tie-broken by event_id
      (4L, 4, Some(0L), None),              // zero gap across the tie
      (9L, 1, None, None)))                 // other key: fresh window
  }

  test("trailingAgg matches a naive per-row self-join on real events") {
    val events = eventsTable().limit(500)
    val fast = Rolling.trailingAgg(events, "user_id", "ts", "value", 1800L)
      .select(col("event_id"), col("n_window"))
    val a = events.selectExpr("event_id", "user_id", "unix_micros(ts) AS t")
    val b = events.selectExpr("user_id AS u2", "unix_micros(ts) AS t2")
    val naive = a.join(b, col("user_id") === col("u2") &&
        col("t2") >= col("t") - lit(1800L * 1000000L) && col("t2") <= col("t"))
      .groupBy("event_id").agg(count(lit(1)).as("n_window"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }
}
