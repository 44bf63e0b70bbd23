package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class ExperimentSpec extends SparkTestBase {

  private def trials(rows: (String, Boolean)*) =
    df("v STRING, ok BOOLEAN", rows.map { case (v, ok) => Row(v, ok) })

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("proportionZ: pooled z hand value, NULL success = failure, degenerate guards") {
    // A: 4/10, B: 2/8 -> pooled 6/18
    val d = trials(
      (Seq.fill(4)("A" -> true) ++ Seq.fill(6)("A" -> false) ++
        Seq.fill(2)("B" -> true) ++ Seq.fill(6)("B" -> false)): _*)
    val r = Experiment.proportionZ(d, "v", "ok", "A", "B").head()
    assert(r.getLong(0) == 10L && r.getLong(1) == 8L)
    assert(r.getAs[Double]("conv_a") == 0.4)
    assert(r.getAs[Double]("conv_b") == 0.25)
    assert(r.getAs[Double]("lift") == 0.15)
    val ph = 6.0 / 18.0
    val z = (0.4 - 0.25) / math.sqrt((ph * (1.0 - ph)) * (1.0 / 10 + 1.0 / 8))
    assert(r.getAs[Double]("z") ==
      BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // NULL success counts as failure
    val withNull = df("v STRING, ok BOOLEAN",
      Seq(Row("A", true), Row("A", null), Row("B", true), Row("B", false)))
    val rn = Experiment.proportionZ(withNull, "v", "ok", "A", "B").head()
    assert(rn.getAs[Double]("conv_a") == 0.5)
    // degenerate pool (all success) -> z NULL, rates still reported
    val all = trials("A" -> true, "B" -> true)
    val ra = Experiment.proportionZ(all, "v", "ok", "A", "B").head()
    assert(ra.getAs[Double]("conv_a") == 1.0 && ra.isNullAt(5))
    // empty arm -> NULL everywhere that needs it
    val one = trials("A" -> true)
    val ro = Experiment.proportionZ(one, "v", "ok", "A", "B").head()
    assert(ro.getLong(1) == 0L && ro.isNullAt(3) && ro.isNullAt(4) && ro.isNullAt(5))
  }

  test("welchT: exact-binary hand case, NULL outcomes drop, tiny-arm guard") {
    // A = (1, 3): m=2, v=2; B = (2, 6): m=4, v=8
    // t = -2/sqrt(1+4) = -0.894427; df = 25/17 = 1.470588
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 2.0), Row("B", 6.0)))
    val r = Experiment.welchT(d, "v", "x", "A", "B").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("t") ==
      BigDecimal(-2.0 / math.sqrt(5.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("df") ==
      BigDecimal(25.0 / 17.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // NULL outcome drops from its arm only
    val withNull = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("A", null),
      Row("B", 2.0), Row("B", 6.0)))
    assert(Experiment.welchT(withNull, "v", "x", "A", "B")
      .head().getLong(0) == 2L)
    // single-value arm -> t/df NULL, means survive
    val tiny = df("v STRING, x DOUBLE",
      Seq(Row("A", 1.0), Row("B", 2.0), Row("B", 6.0)))
    val rt = Experiment.welchT(tiny, "v", "x", "A", "B").head()
    assert(rt.getAs[Double]("mean_a") == 1.0 && rt.isNullAt(4) && rt.isNullAt(5))
    // both arms constant -> zero variance -> NULL t
    val const = df("v STRING, x DOUBLE",
      Seq(Row("A", 5.0), Row("A", 5.0), Row("B", 5.0), Row("B", 5.0)))
    assert(Experiment.welchT(const, "v", "x", "A", "B").head().isNullAt(4))
  }

  test("cmh: hand-computed 2-stratum chi-square and MH odds ratio") {
    import org.apache.spark.sql.Row
    // stratum 1: A 6/10, B 4/10; stratum 2: A 1/5, B 3/15
    def rows(st: String, v: String, succ: Int, total: Int) =
      (0 until total).map(i => Row(st, v, i < succ))
    val d = df("st STRING, v STRING, ok BOOLEAN",
      rows("s1", "A", 6, 10) ++ rows("s1", "B", 4, 10) ++
        rows("s2", "A", 1, 5) ++ rows("s2", "B", 3, 15))
    val r = Experiment.cmh(d, "st", "v", "ok", "A", "B").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 40L)
    // E = 5 + 1 = 6; Var = 10000/7600 + 4800/7600 (9 dp each);
    // chi2 = (7-6)^2 / 1.947368421
    val v1 = BigDecimal(10000.0 / 7600.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v2 = BigDecimal(4800.0 / 7600.0)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = BigDecimal(1.0 / (v1 + v2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("chi2_cmh") == chi2)
    // OR_MH = (1.8 + 0.6) / (0.8 + 0.6) = 2.4/1.4
    assert(r.getAs[Double]("or_mh") ==
      BigDecimal(2.4 / 1.4).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    // all-failure strata -> OR denominator 0 -> NULL or, chi2 defined
    val flat = df("st STRING, v STRING, ok BOOLEAN",
      rows("s1", "A", 2, 4) ++ rows("s1", "B", 0, 4))
    val rf = Experiment.cmh(flat, "st", "v", "ok", "A", "B").head()
    assert(rf.isNullAt(3) && !rf.isNullAt(2))
  }

  test("srm: goodness-of-fit against the designed split, 95% flag") {
    import org.apache.spark.sql.Row
    def arms(na: Int, nb: Int) = df("v STRING",
      (0 until na).map(_ => Row("A")) ++ (0 until nb).map(_ => Row("B")))
    // 60/40 at design 0.5: chi2 = 100/50 + 100/50 = 4 > 3.841459
    val bad = Experiment.srm(arms(60, 40), "v", "A", "B").head()
    assert(bad.getLong(0) == 60L && bad.getAs[Double]("expected_a") == 50.0)
    assert(bad.getAs[Double]("chi2") == 4.0 && bad.getAs[Boolean]("srm_detected"))
    // 52/48: chi2 = 0.16 -> healthy
    val ok = Experiment.srm(arms(52, 48), "v", "A", "B").head()
    assert(ok.getAs[Double]("chi2") == 0.16 && !ok.getAs[Boolean]("srm_detected"))
    // designed 3:1 split realized exactly -> chi2 = 0
    val skewed = Experiment.srm(arms(75, 25), "v", "A", "B", ratioA = 0.75)
      .head()
    assert(skewed.getAs[Double]("chi2") == 0.0)
    // empty experiment -> NULL statistics
    val empty = Experiment.srm(arms(0, 0), "v", "A", "B").head()
    assert(empty.isNullAt(2) && empty.isNullAt(3) && empty.isNullAt(4))
  }

  test("quantileLift: per-arm discrete quantiles and their differences") {
    import org.apache.spark.sql.Row
    val d = df("v STRING, x DOUBLE",
      (1 to 10).map(i => Row("A", i.toDouble)) ++
        Seq(Row("B", 2.0), Row("B", 4.0), Row("B", 6.0)) :+
        Row("C", 99.0))    // unlisted arm is ignored
    val out = Experiment.quantileLift(d, "v", "x", "A", "B", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // A p50 = rank 5 -> 5, p90 = rank 9 -> 9; B p50 = rank 2 -> 4,
    // p90 = rank ceil(2.7) = 3 -> 6
    assert(out(0.5) == ((5.0, 4.0, 1.0)))
    assert(out(0.9) == ((9.0, 6.0, 3.0)))
    // one empty arm -> NULLs on its side, rows survive via full-outer
    val lone = df("v STRING, x DOUBLE", Seq(Row("A", 1.0), Row("A", 2.0)))
    val r = Experiment.quantileLift(lone, "v", "x", "A", "B", Seq(0.5)).head()
    assert(r.getDouble(1) == 1.0 && r.isNullAt(2) && r.isNullAt(3))
  }

  test("cuped: exact-binary hand case — pooled theta, adjusted moments, reduction") {
    // pooled: sx=20 sxx=144 sy=20 sxy=136, n=5 -> varP=16 covP=14
    // theta = 0.875 (exact); xbar = 4
    // A (0,1),(8,7): m'=4, v' = 18 - 2·0.875·24 + 0.875²·32 = 0.5
    // B (0,0),(8,8),(4,4): m'=4, v' = 16 - 28 + 12.25 = 0.25
    val d = df("v STRING, y DOUBLE, x DOUBLE", Seq(
      Row("A", 1.0, 0.0), Row("A", 7.0, 8.0),
      Row("B", 0.0, 0.0), Row("B", 8.0, 8.0), Row("B", 4.0, 4.0)))
    val r = Experiment.cuped(d, "v", "y", "x", "A", "B").head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(r.getAs[Double]("theta") == 0.875)
    assert(r.getAs[Double]("mean_a_adj") == 4.0)
    assert(r.getAs[Double]("mean_b_adj") == 4.0)
    assert(r.getAs[Double]("lift_adj") == 0.0)
    assert(r.getAs[Double]("t") == 0.0)
    // 1 - (0.5+0.25)/(18+16) = 0.977941
    assert(r.getAs[Double]("var_reduction") == 0.977941)
    // constant covariate -> theta undefined -> NULL statistics
    val flat = df("v STRING, y DOUBLE, x DOUBLE", Seq(
      Row("A", 1.0, 3.0), Row("A", 2.0, 3.0),
      Row("B", 3.0, 3.0), Row("B", 4.0, 3.0)))
    val rf = Experiment.cuped(flat, "v", "y", "x", "A", "B").head()
    assert(rf.isNullAt(2) && rf.isNullAt(6))
    // a NULL covariate drops the row from its arm (complete-case)
    val miss = df("v STRING, y DOUBLE, x DOUBLE", Seq(
      Row("A", 1.0, 0.0), Row("A", 7.0, 8.0), Row("A", 9.0, null),
      Row("B", 0.0, 0.0), Row("B", 8.0, 8.0), Row("B", 4.0, 4.0)))
    assert(Experiment.cuped(miss, "v", "y", "x", "A", "B")
      .head().getLong(0) == 2L)
  }

  test("mannWhitney: tie-corrected hand case") {
    // A = 1,2,3; B = 2,4 -> avg ranks 1, 2.5(tie), 4, 5
    // R_A = 7.5, U = 1.5, mu = 3, corr = 6 - 6/20, s2 = 0.5*5.7
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 2.0), Row("A", 3.0),
      Row("B", 2.0), Row("B", 4.0)))
    val r = Experiment.mannWhitney(d, "v", "x", "A", "B").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("rank_sum_a") == 7.5)
    assert(r.getAs[Double]("u_a") == 1.5)
    val sg = r9(math.sqrt(r9(6.0 / 12.0 * r9(6.0 - 6.0 / 20.0))))
    assert(r.getAs[Double]("z") == r6(-1.5 / sg))
  }

  test("mannWhitney: 6-dp quantization merges sub-precision near-ties") {
    // 1.0 vs 1.0000000001 differ only past 6 dp -> one cell, full tie:
    // avg ranks 1.5, 1.5, 3 -> R_A = 4.5, same as exact ties at 1.0.
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 1.0000000001)))
    val r = Experiment.mannWhitney(d, "v", "x", "A", "B").head()
    assert(r.getAs[Double]("rank_sum_a") == 4.5)
    // ...while a >=1e-6 gap stays a distinct cell (ranks 1, 2, 3)
    val d2 = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 1.000001)))
    val r2m = Experiment.mannWhitney(d2, "v", "x", "A", "B").head()
    assert(r2m.getAs[Double]("rank_sum_a") == 4.0)
  }

  test("mannWhitney: all-tied values -> sigma 0 -> NULL z") {
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 2.0), Row("A", 2.0), Row("B", 2.0)))
    val r = Experiment.mannWhitney(d, "v", "x", "A", "B").head()
    // every value tied: rank 2 each, R_A = 4, corr = 4 - 24/12 = 2...
    // but s2 > 0 only through corr; with one value t=n so corr = n+1 -
    // (n^3-n)/(n(n-1)) = n+1 - (n+1) = 0 -> z NULL
    assert(r.getAs[Double]("rank_sum_a") == 4.0)
    assert(r.isNullAt(4))
  }

  test("mannWhitney: empty arm guards") {
    val d = df("v STRING, x DOUBLE", Seq(Row("A", 1.0), Row("A", 2.0)))
    val r = Experiment.mannWhitney(d, "v", "x", "A", "B").head()
    assert(r.getLong(1) == 0L && r.isNullAt(3) && r.isNullAt(4))
  }

  test("did: hand-computed lift and z; parallel shift cancels") {
    val d = df("g STRING, p STRING, x DOUBLE", Seq(
      Row("t", "pre", 1.0), Row("t", "pre", 2.0),
      Row("t", "post", 4.0), Row("t", "post", 6.0),
      Row("c", "pre", 1.0), Row("c", "pre", 3.0),
      Row("c", "post", 2.0), Row("c", "post", 4.0)))
    val r = Experiment.did(d, "g", "p", "x", "t", "c", "pre", "post").head()
    assert((0 to 3).map(r.getLong) == Seq(2L, 2L, 2L, 2L))
    assert(r.getAs[Double]("did") == 2.5)
    // se^2 = 0.5/2 + 2/2 + 2/2 + 2/2 = 3.25
    val se = r9(math.sqrt(3.25))
    assert(r.getAs[Double]("se") == r6(se))
    assert(r.getAs[Double]("z") == r6(2.5 / se))
    // control moves identically to treatment -> did 0
    val par = df("g STRING, p STRING, x DOUBLE", Seq(
      Row("t", "pre", 1.0), Row("t", "pre", 3.0),
      Row("t", "post", 5.0), Row("t", "post", 7.0),
      Row("c", "pre", 2.0), Row("c", "pre", 4.0),
      Row("c", "post", 6.0), Row("c", "post", 8.0)))
    assert(Experiment.did(par, "g", "p", "x", "t", "c", "pre", "post")
      .head().getAs[Double]("did") == 0.0)
  }

  test("mde: hand moments, observed-delta sample size, degenerate guards") {
    // A = 1,3 (v=2); B = 2,6 (v=8)
    val d = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 2.0), Row("B", 6.0)))
    val r = Experiment.minDetectableEffect(d, "v", "x", "A", "B").head()
    val zs = r9(Experiment.normalQuantile(0.975) +
      Experiment.normalQuantile(0.8))
    val mde = r9(zs * r9(math.sqrt(5.0)))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getAs[Double]("mean_a") == 2.0)
    assert(r.getAs[Double]("mde_abs") == r6(mde))
    assert(r.getAs[Double]("mde_rel") == r6(mde / 2.0))
    assert(r.getAs[Long]("n_required") ==
      math.ceil(r9(r9(zs * zs * 10.0) / 4.0)).toLong)
    // identical arms: delta 0 -> n_required NULL, mde still real
    val same = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 1.0), Row("B", 3.0)))
    val r2 = Experiment.minDetectableEffect(same, "v", "x", "A", "B").head()
    assert(!r2.isNullAt(4) && r2.isNullAt(6))
    // 1-value arm voids every statistic
    val tiny = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("B", 2.0), Row("B", 3.0)))
    val r3 = Experiment.minDetectableEffect(tiny, "v", "x", "A", "B").head()
    assert(r3.isNullAt(4) && r3.isNullAt(5) && r3.isNullAt(6))
  }

  test("mdeProportion: observed-rate variances and required n") {
    val d = df("v STRING, ok BOOLEAN", Seq(
      Row("A", true), Row("A", true), Row("A", false), Row("A", false),
      Row("B", true), Row("B", false), Row("B", false), Row("B", false)))
    val r = Experiment.minDetectableEffectProportion(
      d, "v", "ok", "A", "B").head()
    val zs = r9(Experiment.normalQuantile(0.975) +
      Experiment.normalQuantile(0.8))
    assert(r.getAs[Double]("conv_a") == 0.5 &&
      r.getAs[Double]("conv_b") == 0.25)
    val se2 = r9(0.25 / 4.0 + 0.1875 / 4.0)
    assert(r.getAs[Double]("mde_abs") == r6(r9(zs * r9(math.sqrt(se2)))))
    assert(r.getAs[Long]("n_required") ==
      math.ceil(r9(r9(zs * zs * r9(0.4375)) / r9(0.0625))).toLong)
    // both arms fully converted: zero variance -> NULL mde
    val sat = df("v STRING, ok BOOLEAN", Seq(
      Row("A", true), Row("B", true)))
    assert(Experiment.minDetectableEffectProportion(
      sat, "v", "ok", "A", "B").head().isNullAt(4))
  }

  test("twoSidedP via grouped z: matches the exact normal within 1e-6") {
    // group g1: strong effect (A 9/10, B 1/10); g2: null (5/10 both)
    def arm(g: String, v: String, k: Int) =
      (1 to 10).map(i => Row(g, v, i <= k))
    val d = df("g STRING, v STRING, ok BOOLEAN",
      arm("g1", "A", 9) ++ arm("g1", "B", 1) ++
        arm("g2", "A", 5) ++ arm("g2", "B", 5))
    val out = Experiment.proportionZGrouped(d, "g", "v", "ok", "A", "B")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("z"), r.getAs[Double]("p_value"))).toMap
    // exact two-sided p for the g1 z against the erf approximation
    val z1 = out("g1")._1
    val exact = 2.0 * (1.0 - 0.5 *
      (1.0 + org.apache.commons.math3.special.Erf.erf(
        math.abs(z1) / math.sqrt(2.0))))
    assert(math.abs(out("g1")._2 - exact) < 1e-6)
    assert(out("g2")._1 == 0.0 && out("g2")._2 == 1.0)
  }

  test("welchTGrouped matches the global welchT per group; p from |t|") {
    val d = df("g STRING, v STRING, x DOUBLE", Seq(
      Row("g1", "A", 1.0), Row("g1", "A", 3.0),
      Row("g1", "B", 6.0), Row("g1", "B", 8.0),
      Row("g2", "A", 2.0), Row("g2", "A", 2.0),
      Row("g2", "B", 2.0), Row("g2", "B", 2.0)))
    val grouped = Experiment.welchTGrouped(d, "g", "v", "x", "A", "B")
      .collect().map(r => r.getString(0) -> r).toMap
    val global = Experiment.welchT(
      d.where(col("g") === "g1"), "v", "x", "A", "B").head()
    assert(grouped("g1").getAs[Double]("t") == global.getAs[Double]("t"))
    assert(grouped("g1").getAs[Double]("df") == global.getAs[Double]("df"))
    assert(grouped("g1").getAs[Double]("p_normal") > 0.0 &&
      grouped("g1").getAs[Double]("p_normal") < 0.05)
    // zero-variance group -> NULL stats
    assert(grouped("g2").isNullAt(5) && grouped("g2").isNullAt(7))
  }

  test("benjaminiHochberg: step-up q-values, monotone from the right") {
    // classic example: p = .01, .02, .03, .04 with m = 4
    val d = df("k STRING, p DOUBLE", Seq(
      Row("a", 0.01), Row("b", 0.04), Row("c", 0.03), Row("d", 0.02),
      Row("x", null)))
    val out = Experiment.benjaminiHochberg(d, "k", "p", alpha = 0.05)
      .orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    // qraw = .04, .04, .04, .04 -> all q = .04, all significant
    assert(out == Seq(("a", 1L, 0.04, true), ("d", 2L, 0.04, true),
      ("c", 3L, 0.04, true), ("b", 4L, 0.04, true)))
    // only the smallest p survives a tighter alpha
    val tight = Experiment.benjaminiHochberg(d, "k", "p", alpha = 0.039)
      .orderBy("rank").collect().map(_.getBoolean(4)).toSeq
    assert(tight == Seq(false, false, false, false))
  }

  test("msprt: negative evidence caps p at 1; strong lift drives it down") {
    // A = 1,3; B = 2,6, tau 1: V = 5, delta -2 -> ln-lambda < 0 -> p 1
    val weak = df("v STRING, x DOUBLE", Seq(
      Row("A", 1.0), Row("A", 3.0), Row("B", 2.0), Row("B", 6.0)))
    val rw = Experiment.msprt(weak, "v", "x", "A", "B").head()
    val lnlW = r9(r9(math.log(math.sqrt(5.0 / 6.0))) +
      r9(r9(r9(4.0) * 1.0) / r9(2.0 * 5.0 * 6.0)))
    assert(rw.getAs[Double]("log_lambda") == r6(lnlW))
    assert(rw.getAs[Double]("p_always") == 1.0)
    // A = 0,1; B = 10,11: V = 0.5, delta -10 -> overwhelming evidence
    val strong = df("v STRING, x DOUBLE", Seq(
      Row("A", 0.0), Row("A", 1.0), Row("B", 10.0), Row("B", 11.0)))
    val rs = Experiment.msprt(strong, "v", "x", "A", "B").head()
    val lnlS = r9(r9(math.log(math.sqrt(0.5 / 1.5))) +
      r9(r9(r9(100.0) * 1.0) / r9(2.0 * 0.5 * 1.5)))
    assert(rs.getAs[Double]("log_lambda") == r6(lnlS))
    assert(rs.getAs[Double]("p_always") == r6(math.exp(0.0 - lnlS)))
    // degenerate: identical constant arms -> V = 0 -> NULLs
    val flat = df("v STRING, x DOUBLE", Seq(
      Row("A", 2.0), Row("A", 2.0), Row("B", 2.0), Row("B", 2.0)))
    assert(Experiment.msprt(flat, "v", "x", "A", "B").head().isNullAt(4))
  }

  test("upliftByBucket: hand-computed two-bucket qini; ties stay together") {
    val d = df("v STRING, s DOUBLE, c INT", Seq(
      Row("0", 0.9, 1), Row("1", 0.9, 0),
      Row("0", 0.5, 0), Row("1", 0.5, 1)))
    val out = Experiment.upliftByBucket(d, "v", "s", "c", "0", "1",
      nBuckets = 2).orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6)))
    // bucket 1 = score cell 0.9 (cum 2 of 4): uplift 1-0=1, qini 1-0·1=1
    // bucket 2 = cell 0.5: uplift 0-1=-1; cumulative qini 1-1·1=0
    assert(out.toSeq == Seq((1, 1L, 1L, 1.0, 1.0), (2, 1L, 1L, -1.0, 0.0)))

    // one score value for everyone: ties never split, so every row lands
    // in the LAST bucket (cum = N -> bucket B) and no other row appears
    val tied = df("v STRING, s DOUBLE, c INT", Seq(
      Row("0", 0.7, 1), Row("1", 0.7, 0), Row("0", 0.7, 0), Row("1", 0.7, 1)))
    val tb = Experiment.upliftByBucket(tied, "v", "s", "c", "0", "1",
      nBuckets = 2).collect()
    assert(tb.map(_.getInt(0)).toSeq == Seq(2))
    assert(tb(0).getLong(1) == 2L && tb(0).getLong(2) == 2L)

    // an arm-empty bucket publishes NULL rates/uplift but keeps counts
    val oneArm = df("v STRING, s DOUBLE, c INT", Seq(
      Row("0", 0.9, 1), Row("0", 0.8, 0), Row("1", 0.2, 1), Row("1", 0.1, 0)))
    val ob = Experiment.upliftByBucket(oneArm, "v", "s", "c", "0", "1",
      nBuckets = 2).orderBy("bucket").collect()
    assert(ob(0).getLong(1) == 2L && ob(0).getLong(2) == 0L)
    assert(ob(0).isNullAt(4) && ob(0).isNullAt(5)) // rate_ctrl, uplift
    assert(ob(0).isNullAt(6)) // qini needs control mass
  }

  test("did: a 1-value cell voids the statistics but not the counts") {
    val d = df("g STRING, p STRING, x DOUBLE", Seq(
      Row("t", "pre", 1.0),
      Row("t", "post", 4.0), Row("t", "post", 6.0),
      Row("c", "pre", 1.0), Row("c", "pre", 3.0),
      Row("c", "post", 2.0), Row("c", "post", 4.0)))
    val r = Experiment.did(d, "g", "p", "x", "t", "c", "pre", "post").head()
    assert(r.getLong(0) == 1L)
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }
}
