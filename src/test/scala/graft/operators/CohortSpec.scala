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

  test("growthAccounting: new/retained/resurrected partition actives; churn flows next day") {
    // u1: d1, d2, d5; u2: d2
    val ev = df("user_id BIGINT, ts TIMESTAMP", Seq(
      Row(1L, ts("2024-01-01 10:00:00")), Row(1L, ts("2024-01-02 10:00:00")),
      Row(1L, ts("2024-01-05 10:00:00")),
      Row(2L, ts("2024-01-02 12:00:00"))))
    val out = Cohort.growthAccounting(ev, "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      ("2024-01-01", 1L, 1L, 0L, 0L, 0L),   // u1 new
      ("2024-01-02", 2L, 1L, 1L, 0L, 0L),   // u2 new, u1 retained
      ("2024-01-03", 0L, 0L, 0L, 0L, 2L),   // both absent -> churned
      ("2024-01-05", 1L, 0L, 0L, 1L, 0L),   // u1 resurrects
      ("2024-01-06", 0L, 0L, 0L, 0L, 1L)))  // u1's trailing churn
    // identity: active = new + retained + resurrected on every row
    assert(out.forall(r => r._2 == r._3 + r._4 + r._5))
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

  test("engagement: trailing-window DAU/WAU/MAU and stickiness") {
    // u1: d1, d2; u2: d1; u3: d9
    val ev = df("user_id BIGINT, ts TIMESTAMP", Seq(
      Row(1L, ts("2024-01-01 10:00:00")), Row(1L, ts("2024-01-02 11:00:00")),
      Row(2L, ts("2024-01-01 12:00:00")),
      Row(3L, ts("2024-01-09 08:00:00"))))
    val out = Cohort.engagement(ev, "user_id", "ts")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) null else r.getDouble(4)))
    assert(out.length == 9)
    assert(out(0) == (("2024-01-01", 2L, 2L, 2L, 1.0)))
    assert(out(1) == (("2024-01-02", 1L, 2L, 2L, 0.5)))
    assert(out(2) == (("2024-01-03", 0L, 2L, 2L, 0.0)))
    // day 8: the 7-day window [d2..d8] holds only u1's d2 visit
    assert(out(7) == (("2024-01-08", 0L, 1L, 2L, 0.0)))
    // day 9: WAU window [d3..d9] = u3 alone; MAU sees everyone
    assert(out(8) == (("2024-01-09", 1L, 1L, 3L, r6(1.0 / 3.0))))
  }

  test("churn: adjacent-period retention split, open last period") {
    // p0 (Jan 1-7): u1, u2; p1 (Jan 8-14): u1 (retained), u3 (new)
    val ev = df("user_id BIGINT, ts TIMESTAMP", Seq(
      Row(1L, ts("2024-01-01 10:00:00")), Row(1L, ts("2024-01-08 10:00:00")),
      Row(2L, ts("2024-01-02 12:00:00")),
      Row(3L, ts("2024-01-09 08:00:00"))))
    val out = Cohort.churn(ev, "user_id", "ts", periodDays = 7)
      .orderBy("period").collect()
    assert(out(0).getDate(0).toString == "2024-01-01")
    assert((1 to 4).map(out(0).getLong) == Seq(2L, 2L, 1L, 1L))
    assert(out(0).getDouble(5) == 0.5)
    assert(out(1).getDate(0).toString == "2024-01-08")
    assert(out(1).getLong(1) == 2L && out(1).getLong(2) == 1L)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4) && out(1).isNullAt(5))
  }

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
