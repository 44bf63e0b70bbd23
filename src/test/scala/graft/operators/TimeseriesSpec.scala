package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.sql.Timestamp

class TimeseriesSpec extends SparkTestBase {

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** `n` events on day k of 2024 (day 1 = Jan 1, a Monday). */
  private def events(counts: Seq[(Int, Int)]) =
    df("ts TIMESTAMP", counts.flatMap { case (day, n) =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(day - 1)
      (0 until n).map(k =>
        Row(Timestamp.valueOf(s"$date 0${k % 9}:00:00")))
    })

  test("dailyCounts zero-fills interior gaps") {
    val out = Timeseries.dailyCounts(
      events(Seq(1 -> 2, 2 -> 1, 5 -> 3)), "ts")
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(out == Seq("2024-01-01" -> 2L, "2024-01-02" -> 1L,
      "2024-01-03" -> 0L, "2024-01-04" -> 0L, "2024-01-05" -> 3L))
  }

  test("flat series + one spike: spike is the only anomaly") {
    // 35 days of constant 5, except day 18 = 50 (z = 4.48, next 1.12)
    val cs = (1 to 35).map(d => d -> (if (d == 18) 50 else 5))
    val out = Timeseries.weekdayAnomaly(events(cs), "ts", halfWindow = 3)
      .orderBy("day").collect()
    // edges (first/last 3 days) have no full window -> NULL trend/z
    assert(out.take(3).forall(_.isNullAt(2)))
    assert(out.takeRight(3).forall(_.isNullAt(2)))
    // interior flat day far from the spike: trend 5
    assert(out(4).getDouble(2) == 5.0)
    val flagged = out.filter(_.getBoolean(5)).map(_.getDate(0).toString)
    assert(flagged.toSeq == Seq("2024-01-18"))
    assert(math.abs(out(17).getDouble(4)) > 3.0)
  }

  test("weekly seasonality is absorbed, not flagged") {
    // Mondays (Jan 1, 8, 15, 22) run 3x hot every week: seasonal, not
    // anomalous. 28 days; weekday of Jan k = (k-1) % 7 (Jan 1 = Monday).
    val cs = (1 to 28).map(d => d -> (if ((d - 1) % 7 == 0) 30 else 10))
    val out = Timeseries.weekdayAnomaly(events(cs), "ts", halfWindow = 3)
      .orderBy("day").collect()
    assert(out.forall(!_.getBoolean(5)))
    // the Monday seasonal offset is strongly positive, others negative
    val monSeasonal = out(7).getDouble(3)
    val tueSeasonal = out(8).getDouble(3)
    assert(monSeasonal > 10.0 && tueSeasonal < 0.0)
  }

  test("9-dp decimal discipline: trend matches the hand mirror") {
    val cs = Seq(1 -> 1, 2 -> 2, 3 -> 4, 4 -> 8, 5 -> 16, 6 -> 32, 7 -> 64)
    val out = Timeseries.weekdayAnomaly(events(cs), "ts", halfWindow = 1)
      .orderBy("day").collect()
    // day 2: trend = (1+2+4)/3 at 9 dp then published at 6 dp
    assert(out(1).getDouble(2) == r6(r9(7.0 / 3)))
    assert(out(0).isNullAt(2) && out(6).isNullAt(2))
  }
}
