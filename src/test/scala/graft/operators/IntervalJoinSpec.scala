package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {

  private lazy val events = eventsTable()

  /** Overlapping synthetic ranges over the events month: 6-hour stride,
    * 2..19-hour widths — so points hit multiple ranges, ranges straddle
    * day-bin boundaries, and some bins are empty. */
  private lazy val ranges = spark.range(80).selectExpr(
    "id AS range_id",
    "timestampadd(HOUR, CAST(id * 6 AS INT), TIMESTAMP '2024-01-01 00:00:00') AS r_start",
    "timestampadd(HOUR, CAST(id * 6 + id % 18 + 2 AS INT), TIMESTAMP '2024-01-01 00:00:00') AS r_end")

  private def naive =
    events.join(ranges,
      events("ts") >= ranges("r_start") && events("ts") < ranges("r_end"))
      .select("event_id", "range_id")

  test("matches the naive theta join exactly (overlaps, bin-straddling ranges)") {
    val fast = IntervalJoin.join(events, ranges, "ts", "r_start", "r_end")
      .select("event_id", "range_id")
    assert(fast.count() > events.count(), "overlapping ranges should multiply matches")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // a smaller bin (more exploded range rows) must not change the result
    val fine = IntervalJoin.join(events, ranges, "ts", "r_start", "r_end",
      binSeconds = 3600L)
      .select("event_id", "range_id")
    assert(fine.exceptAll(naive).isEmpty && naive.exceptAll(fine).isEmpty)
  }

  test("half-open bounds: start inclusive, end exclusive; degenerate ranges drop") {
    val pts = df("ts TIMESTAMP, tag STRING", Seq(
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "at-start"),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 06:00:00"), "at-end"),
      org.apache.spark.sql.Row(null, "null-ts")))
    val rng = df("range_id BIGINT, r_start TIMESTAMP, r_end TIMESTAMP", Seq(
      org.apache.spark.sql.Row(1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 06:00:00")),
      org.apache.spark.sql.Row(2L, java.sql.Timestamp.valueOf("2024-01-01 03:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 03:00:00")), // zero-width
      org.apache.spark.sql.Row(3L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 07:00:00")))) // inverted
    val out = IntervalJoin.join(pts, rng, "ts", "r_start", "r_end")
      .select("tag", "range_id")
    assertSameRows(out, Seq(Seq("at-start", 1L)))
  }

  test("extra equi-keys constrain matches and the key column is deduped") {
    val byUser = ranges.withColumn("user_id", col("range_id") % 7)
    val out = IntervalJoin.join(events, byUser, "ts", "r_start", "r_end",
      keys = Seq("user_id"))
    assert(out.columns.count(_ == "user_id") == 1)
    val expected = naive.join(events.select("event_id", "user_id"), "event_id")
      .join(ranges.withColumn("r_user", col("range_id") % 7), "range_id")
      .where(col("user_id") === col("r_user"))
      .select("event_id", "range_id")
    val got = out.select("event_id", "range_id")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("plans an equi-join, not a nested-loop product") {
    val plan = IntervalJoin.join(events, ranges, "ts", "r_start", "r_end")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Join"), plan)
    // the naive formulation is exactly the nested-loop plan we avoid
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("CartesianProduct"),
      naivePlan)
  }
}
