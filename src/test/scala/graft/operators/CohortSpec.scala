package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.sql.Timestamp

class CohortSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  // 2024-01-01 is a Monday. u1 cohort W0 active W0+W2 (twice in W2: dedup);
  // u2 cohort W0 only; u3 cohort W1 active W1+W2.
  private lazy val events = df("user_id BIGINT, ts TIMESTAMP", Seq(
    Row(1L, ts("2024-01-01 10:00:00")), Row(1L, ts("2024-01-15 09:00:00")),
    Row(1L, ts("2024-01-16 09:00:00")),
    Row(2L, ts("2024-01-03 12:00:00")),
    Row(3L, ts("2024-01-09 08:00:00")), Row(3L, ts("2024-01-17 23:00:00"))))

  test("weekly retention triangle: cohorts by first week, distinct users per offset") {
    assertRowsInOrder(
      Cohort.retention(events, "user_id", "ts").orderBy("cohort", "period_offset"),
      Seq(
        Seq("2024-01-01", 0L, 2L),
        Seq("2024-01-01", 2L, 1L),
        Seq("2024-01-08", 0L, 1L),
        Seq("2024-01-08", 1L, 1L)))
  }

  test("retentionRate normalizes by cohort size; offset 0 is exactly 1.0") {
    val out = Cohort.retentionRate(events, "user_id", "ts")
      .orderBy("cohort", "period_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 1.0),
      ("2024-01-01", 2L, 0.5),
      ("2024-01-08", 0L, 1.0),
      ("2024-01-08", 1L, 1.0)))
  }

  test("daily period and bad period argument") {
    val daily = Cohort.retention(events, "user_id", "ts", "day")
      .filter("cohort = '2024-01-01'").orderBy("period_offset").collect()
    assert(daily.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 1L), (14L, 1L), (15L, 1L)))
    intercept[IllegalArgumentException] {
      Cohort.retention(events, "user_id", "ts", "month")
    }
  }
}
