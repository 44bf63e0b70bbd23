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

  test("trailingAgg matches a naive per-row self-join on real events") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      .limit(500)
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
