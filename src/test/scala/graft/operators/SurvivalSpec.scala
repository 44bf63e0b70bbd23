package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class SurvivalSpec extends SparkTestBase {

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  /** Mirror of the operator's log-space product: 9-dp terms, 9-dp
    * ln steps, 6-dp exp — the exact cross-engine discipline. */
  private def kmProduct(terms: Seq[Double]): Double =
    r6(math.exp(terms.map(t => BigDecimal(r9(math.log(r9(t)))))
      .sum.toDouble))

  test("kaplanMeier: hand-built curve with censoring and a death-out") {
    // group g: E@1, C@2, E@3, E@3, C@4, E@5, C@5  (n = 7)
    // group z: E@2, E@2 — everyone dies at once -> survival 0
    val subjects = Seq(
      ("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true),
      ("g", 3.0, true), ("g", 4.0, false), ("g", 5.0, true),
      ("g", 5.0, false),
      ("z", 2.0, true), ("z", 2.0, true))
    val d = df("grp STRING, dur DOUBLE, ev BOOLEAN",
      subjects.map(s => Row(s._1, s._2, s._3)))
    val out = Survival.kaplanMeier(d, "grp", "dur", "ev")
      .orderBy("group", "t").collect()
    // event times only: g -> 1, 3, 5 (t=2, 4 are censor-only); z -> 2
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("g", 1.0), ("g", 3.0), ("g", 5.0), ("z", 2.0)))
    // risk sets: 7 at t=1; 7-2=5 at t=3; 5-2-1=2 at t=5; z: 2
    assert(out.map(_.getLong(2)).toSeq == Seq(7L, 5L, 2L, 2L))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L, 1L, 2L))
    val s = out.map(_.getDouble(4))
    assert(s(0) == kmProduct(Seq(6.0 / 7)))
    assert(s(1) == kmProduct(Seq(6.0 / 7, 3.0 / 5)))
    assert(s(2) == kmProduct(Seq(6.0 / 7, 3.0 / 5, 1.0 / 2)))
    assert(s(3) == 0.0) // d == n -> exact zero, not exp(-inf)
    // survival is non-increasing within a group
    assert(s(0) >= s(1) && s(1) >= s(2))
  }

  test("nelsonAalen: cumulative hazard on the same hand-built curve") {
    val subjects = Seq(
      ("g", 1.0, true), ("g", 2.0, false), ("g", 3.0, true),
      ("g", 3.0, true), ("g", 4.0, false), ("g", 5.0, true),
      ("g", 5.0, false),
      ("z", 2.0, true), ("z", 2.0, true))
    val d = df("grp STRING, dur DOUBLE, ev BOOLEAN",
      subjects.map(s => Row(s._1, s._2, s._3)))
    val out = Survival.nelsonAalen(d, "grp", "dur", "ev")
      .orderBy("group", "t").collect()
    // same grid/risk sets as KM
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("g", 1.0), ("g", 3.0), ("g", 5.0), ("z", 2.0)))
    def hsum(hs: Seq[Double]) =
      hs.map(h => BigDecimal(r9(h))).sum.toDouble
    val h = out.map(_.getDouble(4))
    assert(h(0) == r6(hsum(Seq(1.0 / 7))))
    assert(h(1) == r6(hsum(Seq(1.0 / 7, 2.0 / 5))))
    assert(h(2) == r6(hsum(Seq(1.0 / 7, 2.0 / 5, 1.0 / 2))))
    // z dies out: H = 1, survival_fh = exp(-1) stays positive
    assert(h(3) == 1.0)
    assert(out(3).getDouble(5) == r6(math.exp(-1.0)))
    // FH survival is finite and close to (always >=) the KM curve
    val km = Survival.kaplanMeier(d, "grp", "dur", "ev")
      .orderBy("group", "t").collect().map(_.getDouble(4))
    out.map(_.getDouble(5)).zip(km).foreach { case (fh, pl) =>
      assert(fh >= pl - 1e-9)
    }
  }

  test("logRank: hand-computed two-group Mantel-Cox statistic") {
    // A: E@1, E@1, C@5;  B: E@3, E@4, C@6
    val d = df("grp STRING, dur DOUBLE, ev BOOLEAN", Seq(
      Row("A", 1.0, true), Row("A", 1.0, true), Row("A", 5.0, false),
      Row("B", 3.0, true), Row("B", 4.0, true), Row("B", 6.0, false)))
    val r = Survival.logRank(d, "grp", "dur", "ev", "A", "B").head()
    assert(r.getLong(0) == 3L) // event times 1, 3, 4
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 2L) // observed A deaths
    // t=1: E1 = 2*3/6 = 1, V = 2*3*3*4/(36*5); t=3: E1 = 1/4,
    // V = 1*1*3*3/(16*3); t=4: E1 = 1/3, V = 1*1*2*2/(9*2)
    val e = Seq(1.0, 0.25, 1.0 / 3).map(x => BigDecimal(r9(x))).sum
    val v = Seq(72.0 / 180, 9.0 / 48, 4.0 / 18)
      .map(x => BigDecimal(r9(x))).sum
    assert(r.getDouble(4) == r6(e.toDouble))
    val dev = 2.0 - e.toDouble
    assert(r.getDouble(5) == r6(dev * dev / v.toDouble))
  }

  test("logRank: degenerate inputs go NULL, not fault") {
    // single subject: one event time, risk set of 1 -> zero variance
    val one = df("grp STRING, dur DOUBLE, ev BOOLEAN",
      Seq(Row("A", 1.0, true)))
    val r1 = Survival.logRank(one, "grp", "dur", "ev", "A", "B").head()
    assert(r1.getLong(0) == 1L && r1.isNullAt(5))
    // no events at all (all censored) -> zero strata, NULL chi2
    val cens = df("grp STRING, dur DOUBLE, ev BOOLEAN",
      Seq(Row("A", 1.0, false), Row("B", 2.0, false)))
    val r2 = Survival.logRank(cens, "grp", "dur", "ev", "A", "B").head()
    assert(r2.getLong(0) == 0L && r2.isNullAt(5))
  }

  test("kaplanMeier: NULL durations drop, NULL event = censored") {
    val d = df("grp STRING, dur DOUBLE, ev BOOLEAN", Seq(
      Row("A", 1.0, true), Row("A", null, true), Row("A", 2.0, null)))
    val out = Survival.kaplanMeier(d, "grp", "dur", "ev").collect()
    assert(out.length == 1) // only t=1 is an event time
    assert(out(0).getLong(2) == 2L) // NULL-duration row dropped from risk
  }
}
