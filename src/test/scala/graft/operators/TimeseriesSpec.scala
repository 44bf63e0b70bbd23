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

  test("acf: period-2 alternation is negative at lag 1, positive at 2") {
    // 1,3,1,3,1,3 -> dev = ±1, denom 6; lag1 = -5/6, lag2 = 4/6
    val cs = (1 to 6).map(d => d -> (if (d % 2 == 0) 3 else 1))
    val out = Timeseries.acf(events(cs), "ts", maxLag = 6)
      .orderBy("lag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSeq
    assert(out(0) == ((1L, 5L, r6(-5.0 / 6))))
    assert(out(1) == ((2L, 4L, r6(4.0 / 6))))
    // lag beyond the span: zero pairs, NULL acf
    assert(out(5) == ((6L, 0L, null)))
  }

  test("acf: constant series has zero variance -> NULL everywhere") {
    val out = Timeseries.acf(events((1 to 5).map(_ -> 2)), "ts", maxLag = 2)
      .collect()
    assert(out.forall(_.isNullAt(2)))
  }

  test("cusum + changepoint: level shift bends the curve at the step") {
    // 5,5,5,9,9,9: mean 7, S = -2,-4,-6,-4,-2,0 -> change day 3
    val cs = (1 to 6).map(d => d -> (if (d <= 3) 5 else 9))
    val c = Timeseries.cusum(events(cs), "ts").orderBy("day").collect()
      .map(_.getDouble(2)).toSeq
    assert(c == Seq(-2.0, -4.0, -6.0, -4.0, -2.0, 0.0))
    val cp = Timeseries.changepoint(events(cs), "ts").collect()(0)
    assert(cp.getDate(0).toString == "2024-01-03")
    assert(cp.getDouble(1) == 6.0)
    // sigma 2, stat = 6 / (2 * sqrt(6)) under the 9-dp discipline
    val stat = r6(6.0 / r9(2.0 * r9(math.sqrt(6.0))))
    assert(cp.getDouble(2) == stat)
  }

  test("changepoint: constant series has NULL stat") {
    val cp = Timeseries.changepoint(
      events((1 to 4).map(_ -> 3)), "ts").collect()(0)
    assert(cp.getDouble(1) == 0.0 && cp.isNullAt(2))
  }

  test("ewma closed form equals the recursion") {
    // alpha 0.5 over 2,4,8: s = 2, 3, 5.5 ((1-a)^k exact at 9 dp)
    val out = Timeseries.ewma(events(
      Seq(1 -> 2, 2 -> 4, 3 -> 8)), "ts", alpha = 0.5)
      .orderBy("day").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(2.0, 3.0, 5.5))
  }

  test("ewma zero-fills gaps (the gap day pulls the average down)") {
    val out = Timeseries.ewma(events(Seq(1 -> 4, 3 -> 4)), "ts", alpha = 0.5)
      .orderBy("day").collect().map(_.getDouble(2)).toSeq
    assert(out == Seq(4.0, 2.0, 3.0))
  }

  test("robust anomaly: MAD flags the spike, median ignores it") {
    // counts 10,12,11,13,12,100,12 -> med 12, MAD 1
    val cs = Seq(1 -> 10, 2 -> 12, 3 -> 11, 4 -> 13, 5 -> 12,
      6 -> 100, 7 -> 12)
    val out = Timeseries.robustAnomaly(events(cs), "ts")
      .orderBy("day").collect()
    assert(out(0).getDouble(2) == 12.0 && out(0).getDouble(3) == 1.0)
    assert(out(5).getDouble(4) == r6(0.6745 * 88.0))
    assert(out.filter(_.getBoolean(5)).map(_.getDate(0).toString).toSeq ==
      Seq("2024-01-06"))
    // day 1 (n=10): z = -1.349, inside the fence
    assert(out(0).getDouble(4) == r6(0.6745 * -2.0))
  }

  test("robust anomaly: majority-constant series has MAD 0 -> NULL z") {
    val cs = Seq(1 -> 5, 2 -> 5, 3 -> 5, 4 -> 5, 5 -> 50)
    val out = Timeseries.robustAnomaly(events(cs), "ts").collect()
    assert(out.forall(r => r.isNullAt(4) && !r.getBoolean(5)))
    assert(out.head.getDouble(3) == 0.0)
  }

  test("seasonal-naive backtest: hand-checked errors") {
    // season 2 over 1..6: errors all 2; smape = mean(1, 2/3, 1/2, 2/5)
    val out = Timeseries.seasonalNaiveBacktest(
      events((1 to 6).map(d => d -> d)), "ts", season = 2).collect()(0)
    assert(out.getLong(0) == 4L)
    assert(out.getDouble(1) == 2.0)
    assert(out.getDouble(2) == 2.0)
    val sm = Seq(1.0, 2.0 / 3, 0.5, 0.4)
      .map(x => BigDecimal(r9(x))).sum.toDouble / 4
    assert(out.getDouble(3) == r6(sm))
  }

  test("holt: alpha=0.5 hand recursion (S', S'', level, trend, forecast)") {
    // counts 2,4,6: S' = 2,3,4.5; S'' = 2,2.5,3.5; ac = 1.0
    val out = Timeseries.holt(events(Seq(1 -> 2, 2 -> 4, 3 -> 6)), "ts",
      alpha = 0.5).orderBy("day").collect()
    def row(i: Int) = (2 to 6).map(out(i).getDouble)
    assert(row(0) == Seq(2.0, 2.0, 2.0, 0.0, 2.0))
    assert(row(1) == Seq(3.0, 2.5, 3.5, 0.5, 4.0))
    assert(row(2) == Seq(4.5, 3.5, 5.5, 1.0, 6.5))
  }

  test("holt: constant series -> zero trend, forecast = level = n") {
    val out = Timeseries.holt(events((1 to 5).map(_ -> 7)), "ts",
      alpha = 0.3).orderBy("day").collect()
    assert(out.forall(r => r.getDouble(4) == 7.0 &&
      r.getDouble(5) == 0.0 && r.getDouble(6) == 7.0))
  }

  test("trendTest: hand-computed S, tie-corrected variance, Sen slope") {
    // counts 1,2,2,4: S = 5; ties {2:2} -> tt = 18;
    // var = (4*3*13 - 18)/18 = 138/18; sen = median of
    // [1, .5, 1, 0, 1, 2] -> 1
    val r = Timeseries.trendTest(
      events(Seq(1 -> 1, 2 -> 2, 3 -> 2, 4 -> 4)), "ts").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    val vs = r9(138.0 / 18.0)
    assert(r.getAs[Double]("var_s") == r6(vs))
    assert(r.getAs[Double]("z") == r6(4.0 / r9(math.sqrt(vs))))
    assert(r.getAs[Double]("sen_slope") == 1.0)
  }

  test("trendTest: constant series -> zero variance, NULL z, sen 0") {
    val r = Timeseries.trendTest(events((1 to 3).map(_ -> 3)), "ts").head()
    assert(r.getLong(1) == 0L && r.getAs[Double]("var_s") == 0.0)
    assert(r.isNullAt(3))
    assert(r.getAs[Double]("sen_slope") == 0.0)
  }

  test("ohlc: first/last by (ts, id), exact extremes, NULL values drop") {
    val d1 = df("ts TIMESTAMP, id LONG, v DOUBLE", Seq(
      Row(Timestamp.valueOf("2024-01-01 01:00:00"), 2L, 10.0),
      Row(Timestamp.valueOf("2024-01-01 01:00:00"), 1L, 7.0),  // same ts: id 1 opens
      Row(Timestamp.valueOf("2024-01-01 05:00:00"), 3L, 3.0),
      Row(Timestamp.valueOf("2024-01-01 09:00:00"), 4L, null),  // drops
      Row(Timestamp.valueOf("2024-01-02 00:00:00"), 5L, 4.0)))
    val out = Timeseries.ohlc(d1, "ts", "v", "id").orderBy("day").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getLong(1) == 3L && r1.getDouble(2) == 7.0 &&
      r1.getDouble(3) == 10.0 && r1.getDouble(4) == 3.0 &&
      r1.getDouble(5) == 3.0)
    val r2 = out(1)
    assert(r2.getLong(1) == 1L && r2.getDouble(2) == 4.0 &&
      r2.getDouble(5) == 4.0)
  }

  test("periodGrowth: WoW deltas; gaps yield NULL growth, not stale baselines") {
    // key a: periods 0,1,3 (gap at 2); period anchored at Jan 1
    val d1 = df("ts TIMESTAMP, k STRING", Seq(
      Row(Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-02 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-08 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-09 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-10 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-22 10:00:00"), "a")))
    val out = Timeseries.periodGrowth(d1, "ts", "k", periodDays = 7)
      .orderBy("period").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4))).toSeq
    assert(out(0) == ("2024-01-01", 2L, -1L, out(0)._4) && out(0)._4.isNaN)
    assert(out(1) == ("2024-01-08", 3L, 2L, 0.5))
    assert(out(2)._1 == "2024-01-22" && out(2)._3 == -1L && out(2)._4.isNaN)
  }

  test("decayedCounts: half-life halves yesterday's weight; exact dyadics") {
    // max day = Jan 3; halfLife 1 -> weights 1, 0.5, 0.25 by age
    val d1 = df("ts TIMESTAMP, k STRING", Seq(
      Row(Timestamp.valueOf("2024-01-03 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-01 11:00:00"), "a"),
      Row(Timestamp.valueOf("2024-01-02 10:00:00"), "b")))
    val out = Timeseries.decayedCounts(d1, "ts", "k", halfLifeDays = 1)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(("a", 3L, 1.5), ("b", 1L, 0.5)))
  }

  test("maseBacktest: seasonal MAE scaled by the naive-1 MAE") {
    // counts 1..6, season 2: eval days 3-6, |n-lag2| = 2, |n-lag1| = 1
    val r = Timeseries.maseBacktest(
      events((1 to 6).map(d => d -> d)), "ts", season = 2).head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 2.0)
  }

  test("maseBacktest: constant series -> naive MAE 0 -> NULL mase") {
    val r = Timeseries.maseBacktest(
      events((1 to 5).map(_ -> 4)), "ts", season = 2).head()
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.isNullAt(3))
  }

  test("trendTest: single day -> no pairs, NULL z and sen") {
    val r = Timeseries.trendTest(events(Seq(1 -> 9)), "ts").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("rollingCorrelation: exact ±1 on linear series; gaps break the window") {
    def ev(day: Int, x: Double, y: Double) =
      Row(Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), x, y)
    val lin = df("ts TIMESTAMP, x DOUBLE, y DOUBLE",
      (1 to 4).map(d => ev(d, d.toDouble, 2.0 * d)))
    val out = Timeseries.rollingCorrelation(lin, "ts", "x", "y", window = 3)
      .orderBy("day").collect()
    assert(out(0).isNullAt(3) && out(1).isNullAt(3)) // ramp-up
    assert(out(2).getDouble(3) == 1.0 && out(3).getDouble(3) == 1.0)
    val anti = df("ts TIMESTAMP, x DOUBLE, y DOUBLE",
      (1 to 3).map(d => ev(d, d.toDouble, -d.toDouble)))
    assert(Timeseries.rollingCorrelation(anti, "ts", "x", "y", 3)
      .orderBy("day").collect()(2).getDouble(3) == -1.0)
    // missing day 3 voids every window spanning it (no zero-fill)
    val gap = df("ts TIMESTAMP, x DOUBLE, y DOUBLE",
      Seq(1, 2, 4, 5).map(d => ev(d, d.toDouble, 2.0 * d)))
    val g = Timeseries.rollingCorrelation(gap, "ts", "x", "y", 3)
      .orderBy("day").collect()
    assert(g.length == 5 && g.forall(_.isNullAt(3)))
  }

  test("locf: per-key grid to the global last day, latest-per-day, forward fill") {
    val d = df("k STRING, ts TIMESTAMP, v DOUBLE", Seq(
      Row("A", Timestamp.valueOf("2024-01-01 08:00:00"), 4.0),
      Row("A", Timestamp.valueOf("2024-01-01 18:00:00"), 5.0), // latest wins
      Row("A", Timestamp.valueOf("2024-01-03 09:00:00"), 7.0),
      Row("B", Timestamp.valueOf("2024-01-02 12:00:00"), 1.0)))
    val out = Timeseries.locf(d, "ts", "k", "v").orderBy("key", "day")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSeq
    assert(out == Seq(
      ("A", "2024-01-01", 5.0, true),  // day's LATEST observation
      ("A", "2024-01-02", 5.0, false), // gap forward-filled
      ("A", "2024-01-03", 7.0, true),
      ("B", "2024-01-02", 1.0, true),  // B's grid starts at ITS first day
      ("B", "2024-01-03", 1.0, false))) // ...and runs to the GLOBAL last
  }
}
