package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * A/B experiment analysis — the decision layer over [[Funnel]]/[[Drift]]:
 * given an assignment (variant) column, quantify whether the measured
 * difference between two arms is real or noise. Two classical tests:
 *
 *  - [[proportionZ]]: two-proportion pooled z-test on a success flag
 *    (conversion, click-through, retention) — the workhorse of binary
 *    outcome experiments;
 *  - [[welchT]]: Welch's unequal-variance t statistic on a numeric
 *    outcome (revenue, latency, dwell time) with the
 *    Welch–Satterthwaite degrees of freedom — Student's equal-variance
 *    assumption is exactly what a treatment breaks, so Welch is the
 *    safe default.
 *
 * Scale shape: both tests are ONE map-side-combined pass over the
 * corpus — a single wide aggregate with per-arm conditional counts/
 * sums, one scalar row out. No join, no window, no second scan;
 * stream-legal as a snapshot aggregate.
 *
 * Float determinism (the SparkEntry policy): values snap to 9 dp and
 * accumulate as DECIMAL (order-free); means/rates are exact int or
 * decimal/int double divisions rounded to 9 dp; the final statistics
 * are fixed-shape double arithmetic rounded to 6 dp — the DuckDB
 * oracle mirrors every operation in order.
 */
object Experiment {

  /** Division that cannot fault: the divisor is swapped for 1.0 when it
    * is 0. Every caller NULL-guards the case where the divisor was 0,
    * but ANSI mode faults a 0-divisor division even inside an untaken
    * CASE branch once whole-stage codegen's subexpression elimination
    * hoists a shared division out of its guard — so the division itself
    * must be total, and the guard only decides what the reader sees. */
  private def sdiv(a: Column, b: Column): Column =
    a / when(b === 0.0, lit(1.0)).otherwise(b)

  /** 6-dp publish of an already-9-dp value via EXACT decimal rounding
    * (see [[Timeseries]] — half-ties at digit 7 of an exact 9-dp
    * decimal are where string-based and binary double rounding
    * disagree across engines). */
  private def pub6(c: Column): Column =
    round(c.cast("decimal(28,9)"), 6).cast("double")

  /**
   * Two-proportion pooled z-test: one row `(n_a, n_b, conv_a, conv_b,
   * lift, z)` where `lift = p_a − p_b` and
   * `z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))` with p̂ the pooled
   * rate. A NULL success flag counts as a failure (an unconverted
   * subject, not a missing one — drop such rows upstream if truly
   * missing); rows in neither arm are ignored. `z` is NULL when either
   * arm is empty or the pooled rate is degenerate (0 or 1 — no
   * variance). `conv_*` and `lift` round to 6 dp; the z arithmetic
   * runs on the EXACT int/int rates, not the rounded display values.
   */
  def proportionZ(df: DataFrame, variantCol: String, successCol: String,
                  variantA: String, variantB: String): DataFrame = {
    val v = col(variantCol).cast("string")
    val s = coalesce(col(successCol).cast("boolean"), lit(false))
    val m = df.agg(
      count(when(v === variantA, lit(1))).as("n_a"),
      count(when(v === variantA && s, lit(1))).as("__k_a"),
      count(when(v === variantB, lit(1))).as("n_b"),
      count(when(v === variantB && s, lit(1))).as("__k_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = sdiv(col("__k_a").cast("double"), na)
    val pb = sdiv(col("__k_b").cast("double"), nb)
    val ph = sdiv((col("__k_a") + col("__k_b")).cast("double"),
      (col("n_a") + col("n_b")).cast("double"))
    val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
      col("__k_a") + col("__k_b") === 0 ||
      col("__k_a") + col("__k_b") === col("n_a") + col("n_b")
    m.select(
      col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(pa, 6)).as("conv_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(pb, 6)).as("conv_b"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(pa - pb, 6)).as("lift"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round((pa - pb) /
          sqrt((ph * (lit(1.0) - ph)) *
            (sdiv(lit(1.0), na) + sdiv(lit(1.0), nb))), 6))
        .as("z"))
  }

  /**
   * CUPED variance reduction (Deng et al. 2013): adjust the outcome by
   * a pre-experiment covariate, `y' = y − θ(x − x̄)` with
   * `θ = cov(x, y) / var(x)` pooled across arms — the standard way to
   * shrink an experiment's confidence intervals without more traffic
   * (a good covariate is the same metric measured before assignment).
   * One row: `(n_a, n_b, theta, mean_a_adj, mean_b_adj, lift_adj, t,
   * var_reduction)` where `t` is Welch's t on the ADJUSTED outcome and
   * `var_reduction = 1 − (v'_a + v'_b)/(v_a + v_b)`.
   *
   * Everything derives from per-arm moment sums in the SAME single
   * pass as [[welchT]] — the adjusted per-arm mean and variance are
   * closed forms of the raw moments (`m' = ȳ_arm − θ(x̄_arm − x̄)`,
   * `v' = v_y − 2θ·cov_arm + θ²·v_x`), so CUPED costs exactly one
   * corpus scan, no materialized adjusted column. Complete-case: rows
   * missing either metric or covariate drop from their arm. NULL
   * statistics when an arm has < 2 rows or the covariate is constant
   * (θ undefined).
   */
  def cuped(df: DataFrame, variantCol: String, metricCol: String,
            covariateCol: String, variantA: String, variantB: String)
      : DataFrame = {
    val v = col(variantCol).cast("string")
    val y0 = round(col(metricCol).cast("double"), 9)
    val x0 = round(col(covariateCol).cast("double"), 9)
    val both = y0.isNotNull && x0.isNotNull
    val dec = "decimal(28,9)"
    def arm(value: String, sfx: String) = {
      val in = v === value && both
      Seq(
        count(when(in, lit(1))).as(s"n_$sfx"),
        sum(when(in, x0).cast(dec)).as(s"__sx_$sfx"),
        sum(when(in, y0).cast(dec)).as(s"__sy_$sfx"),
        sum(when(in, round(x0 * y0, 9)).cast(dec)).as(s"__sxy_$sfx"),
        sum(when(in, round(x0 * x0, 9)).cast(dec)).as(s"__sxx_$sfx"),
        sum(when(in, round(y0 * y0, 9)).cast(dec)).as(s"__syy_$sfx"))
    }
    val m = df.agg(arm(variantA, "a").head,
      (arm(variantA, "a").tail ++ arm(variantB, "b")): _*)
    def d(c: String) = col(c).cast("double")
    val na = d("n_a"); val nb = d("n_b")
    val n = na + nb
    // pooled θ from pooled sums (arms share one adjustment)
    val sx = d("__sx_a") + d("__sx_b")
    val sy = d("__sy_a") + d("__sy_b")
    val sxy = d("__sxy_a") + d("__sxy_b")
    val sxx = d("__sxx_a") + d("__sxx_b")
    val xbar = round(sdiv(sx, n), 9)
    val covP = round(sdiv(sxy - sdiv(sx * sy, n), n - lit(1.0)), 9)
    val varP = round(sdiv(sxx - sdiv(sx * sx, n), n - lit(1.0)), 9)
    val theta = round(sdiv(covP, varP), 9)
    def adj(sfx: String): (Column, Column, Column) = {
      val nn = d(s"n_$sfx")
      val mx = round(sdiv(d(s"__sx_$sfx"), nn), 9)
      val my = round(sdiv(d(s"__sy_$sfx"), nn), 9)
      val cov = round(sdiv(d(s"__sxy_$sfx") - sdiv(d(s"__sx_$sfx") *
        d(s"__sy_$sfx"), nn), nn - lit(1.0)), 9)
      val vx = round(sdiv(d(s"__sxx_$sfx") - sdiv(d(s"__sx_$sfx") *
        d(s"__sx_$sfx"), nn), nn - lit(1.0)), 9)
      val vy = round(sdiv(d(s"__syy_$sfx") - sdiv(d(s"__sy_$sfx") *
        d(s"__sy_$sfx"), nn), nn - lit(1.0)), 9)
      val meanAdj = round(my - theta * (mx - xbar), 9)
      val varAdj = round(vy - lit(2.0) * theta * cov + theta * theta * vx, 9)
      (meanAdj, varAdj, vy)
    }
    val (ma, va, vya) = adj("a")
    val (mb, vb, vyb) = adj("b")
    val undef = col("n_a") < 2 || col("n_b") < 2
    def guard(c: Column, extra: Column = lit(false)) =
      when(undef || extra, lit(null).cast("double")).otherwise(c)
    m.select(
      col("n_a"), col("n_b"),
      guard(round(theta, 6), varP === 0.0).as("theta"),
      guard(round(ma, 6), varP === 0.0).as("mean_a_adj"),
      guard(round(mb, 6), varP === 0.0).as("mean_b_adj"),
      guard(round(ma - mb, 6), varP === 0.0).as("lift_adj"),
      guard(round((ma - mb) / sqrt(sdiv(va, na) + sdiv(vb, nb)), 6),
        varP === 0.0 || (va + vb) === 0.0).as("t"),
      guard(round(lit(1.0) - sdiv(va + vb, vya + vyb), 6),
        varP === 0.0 || (vya + vyb) === 0.0).as("var_reduction"))
  }

  /**
   * Cochran–Mantel–Haenszel test over K strata (2×2×K): the stratified
   * version of [[proportionZ]] — when assignment is balanced WITHIN
   * strata (country, platform, signup cohort) but the mix differs,
   * pooling naively invites Simpson's paradox; CMH combines the
   * per-stratum 2×2 evidence instead. One row:
   * `(n_strata, n, chi2_cmh, or_mh)` — the CMH chi-square
   * `(Σ s_a − Σ E)² / Σ Var` (no continuity correction) and the
   * Mantel–Haenszel common odds ratio. NULL success = failure (as in
   * [[proportionZ]]); rows outside both arms drop; single-subject
   * strata contribute expectation but zero variance. `chi2_cmh` NULL
   * when ΣVar = 0; `or_mh` NULL when its denominator is 0.
   *
   * Scale shape: ONE corpus pass to per-stratum conditional counts
   * (map-side combined, |strata|-sized), then 9-dp per-stratum terms
   * DECIMAL-summed into the two scalar statistics. Stream-legal like
   * the rest of the battery.
   */
  def cmh(df: DataFrame, stratumCol: String, variantCol: String,
          successCol: String, variantA: String, variantB: String)
      : DataFrame = {
    val v = col(variantCol).cast("string")
    val s = coalesce(col(successCol).cast("boolean"), lit(false))
    val cells = df
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(
        count(when(v === variantA, lit(1))).as("n_a"),
        count(when(v === variantA && s, lit(1))).as("s_a"),
        count(when(v === variantB, lit(1))).as("n_b"),
        count(when(v === variantB && s, lit(1))).as("s_b"))
      .where(col("n_a") + col("n_b") > 0)
    def d(c: Column) = c.cast("double")
    val nk = d(col("n_a") + col("n_b"))
    val sk = d(col("s_a") + col("s_b"))
    val fk = nk - sk
    val e = round(sdiv(d(col("n_a")) * sk, nk), 9)
    val variance = round(sdiv(
      d(col("n_a")) * d(col("n_b")) * sk * fk,
      nk * nk * (nk - lit(1.0))), 9)
    // single-subject strata: Var's (N−1) term is 0 — contribute 0
    val varTerm = when(col("n_a") + col("n_b") < 2, lit(0.0))
      .otherwise(variance)
    val orNum = round(sdiv(d(col("s_a")) * (d(col("n_b")) - d(col("s_b"))),
      nk), 9)
    val orDen = round(sdiv(d(col("s_b")) * (d(col("n_a")) - d(col("s_a"))),
      nk), 9)
    val dec = "decimal(28,9)"
    val m = cells.agg(
      count(lit(1)).as("n_strata"),
      sum(col("n_a") + col("n_b")).as("n"),
      sum(d(col("s_a")).cast(dec)).as("__sa"),
      sum(e.cast(dec)).as("__e"),
      sum(varTerm.cast(dec)).as("__var"),
      sum(orNum.cast(dec)).as("__on"),
      sum(orDen.cast(dec)).as("__od"))
    val dev = col("__sa").cast("double") - col("__e").cast("double")
    m.select(
      col("n_strata"), col("n"),
      when(col("__var").cast("double") === 0.0, lit(null).cast("double"))
        .otherwise(round(dev * dev /
          when(col("__var").cast("double") === 0.0, lit(1.0))
            .otherwise(col("__var").cast("double")), 6)).as("chi2_cmh"),
      when(col("__od").cast("double") === 0.0, lit(null).cast("double"))
        .otherwise(round(sdiv(col("__on").cast("double"),
          col("__od").cast("double")), 6)).as("or_mh"))
  }

  /**
   * Sample-ratio-mismatch check — the FIRST thing to run on any
   * experiment readout: if the realized arm split is statistically
   * incompatible with the designed split, the assignment machinery is
   * broken and every downstream statistic is invalid. Chi-square
   * goodness-of-fit of the two arm counts against `ratioA : 1−ratioA`,
   * flagged against the 95% critical value (3.841459, 1 dof). One
   * row: `(n_a, n_b, expected_a, chi2, srm_detected)`; NULL chi2/flag
   * on an empty experiment. One conditional-count pass, stream-legal.
   */
  def srm(df: DataFrame, variantCol: String,
          variantA: String, variantB: String,
          ratioA: Double = 0.5): DataFrame = {
    require(ratioA > 0 && ratioA < 1, s"ratioA must be in (0,1), got $ratioA")
    val v = col(variantCol).cast("string")
    val m = df.agg(
      count(when(v === variantA, lit(1))).as("n_a"),
      count(when(v === variantB, lit(1))).as("n_b"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val ea = round(lit(ratioA) * n, 9)
    val eb = round(lit(1.0 - ratioA) * n, 9)
    val chi2 = round(
      sdiv((col("n_a").cast("double") - ea) * (col("n_a").cast("double") - ea),
        ea) +
      sdiv((col("n_b").cast("double") - eb) * (col("n_b").cast("double") - eb),
        eb), 6)
    m.select(col("n_a"), col("n_b"),
      when(n === 0.0, lit(null).cast("double")).otherwise(ea).as("expected_a"),
      when(n === 0.0, lit(null).cast("double")).otherwise(chi2).as("chi2"),
      when(n === 0.0, lit(null).cast("boolean"))
        .otherwise(chi2 > lit(3.841459)).as("srm_detected"))
  }

  /**
   * Quantile treatment effect: per-arm EXACT discrete quantiles of the
   * outcome and their difference — the robust companion to [[welchT]]'s
   * mean lift (a fat-tailed outcome like revenue moves its p50 and p99
   * very differently, and the mean hides which). One row per p:
   * `(p, q_a, q_b, diff)`; an arm with no rows yields NULLs on its
   * side. Rides [[Profile.quantiles]] (value-cell compression, one
   * shuffle for all ps, rank = ceil(round(p·n, 9)) — see its scaladoc
   * for the exactness discipline); the arm pivot is a |ps|-row join.
   */
  def quantileLift(df: DataFrame, variantCol: String, valueCol: String,
                   variantA: String, variantB: String,
                   ps: Seq[Double]): DataFrame = {
    val base = df
      .where(col(variantCol).cast("string").isin(variantA, variantB) &&
        col(valueCol).isNotNull)
      .select(col(variantCol).cast("string").as("__v"),
        col(valueCol).as("__x"))
    val q = Profile.quantiles(base, "__v", "__x", ps)
    val qa = q.filter(col("__v") === variantA)
      .select(col("p"), col("value").cast("double").as("q_a"))
    val qb = q.filter(col("__v") === variantB)
      .select(col("p").as("__pb"), col("value").cast("double").as("q_b"))
    qa.join(qb, col("p") === col("__pb"), "full_outer")
      .select(coalesce(col("p"), col("__pb")).as("p"),
        col("q_a"), col("q_b"),
        round(col("q_a") - col("q_b"), 6).as("diff"))
  }

  /**
   * Uplift by score bucket + the Qini curve (Radcliffe 2007) — the
   * standard audit of an uplift/targeting model: rank the population by
   * model score (best first), cut into `nBuckets` quantile buckets, and
   * per bucket compare treated vs control conversion. `uplift` is the
   * bucket's incremental rate (rate_treat − rate_ctrl); `qini` is the
   * CUMULATIVE incremental conversions through this bucket,
   * `ΣconvT − ΣconvC · ΣnT/ΣnC` — the curve whose area ranks targeting
   * models. A model with no signal gives a flat uplift profile and a
   * straight-line qini.
   *
   * Bucketing: rows reduce to (score, arm) VALUE CELLS first; buckets
   * cut the DESC-cumulative cell counts at ceil(cum·B/N) with TIES KEPT
   * TOGETHER (a score value never splits across buckets — the same
   * choice every quantile-binned audit here makes, and what makes the
   * assignment a pure function of the data rather than of row order).
   * Under heavy ties a bucket can absorb its neighbours' mass; swallowed
   * buckets emit no row (readers zero-fill, the scan doesn't).
   *
   * Scale shape: ONE map-side-combined reduce to |distinct scores|
   * cells (scores snap to 6 dp — the [[Eval.aucRoc]] tie discipline),
   * a [[graft.plans.CumWalk]] cumulative count over the cell table
   * (partition-parallel even for an uncalibrated wide-range scorer),
   * and a ≤B-row rollup — corpus rows never enter a window and no
   * window is single-reducer. 6-dp quantization can only merge
   * adjacent cells, which changes bucket boundaries by at most one
   * cell's mass.
   *
   * Determinism: counts exact; rates/uplift/qini are fixed-order double
   * expressions published at 6 dp.
   */
  def upliftByBucket(df: DataFrame, variantCol: String, scoreCol: String,
                     outcomeCol: String, variantA: String, variantB: String,
                     nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val v = col(variantCol).cast("string")
    def d(c: Column) = c.cast("double")
    val cells = df
      .where(col(scoreCol).isNotNull && col(outcomeCol).isNotNull &&
        v.isin(variantA, variantB))
      .groupBy(round(col(scoreCol).cast("double"), 6).as("__s"))
      .agg(
        count(when(v === variantA, lit(1))).as("__nt"),
        count(when(v === variantB, lit(1))).as("__nc"),
        count(when(v === variantA &&
          col(outcomeCol).cast("double") =!= 0.0, lit(1))).as("__ct"),
        count(when(v === variantB &&
          col(outcomeCol).cast("double") =!= 0.0, lit(1))).as("__cc"))
    // bucket of a cell: ceil(B * cumulative rows through the cell / N),
    // clamped to B (exact-integer arithmetic — no float boundary risk);
    // the cumulative count walks through CumWalk (no single-reducer
    // window) and the grand total is a 1-row broadcast aggregate over
    // the WALKED frame (materialized cells — aggregating the raw cells
    // would re-run the corpus reduce a second time)
    val walked = graft.plans.CumWalk.walk(
      cells.withColumn("__ntc", col("__nt") + col("__nc")),
      "__s", asc = false, Seq(graft.plans.CumWalk.CumSum("__ntc", "__cum")))
    val totalN = walked.agg(sum(col("__ntc")).as("__n"))
    val bucketed = walked
      .crossJoin(broadcast(totalN))
      .withColumn("bucket",
        least(lit(nBuckets.toLong),
          expr(s"(__cum * $nBuckets + __n - 1) div __n")).cast("int"))
    val perBucket = bucketed.groupBy("bucket").agg(
      sum(col("__nt")).as("n_treat"), sum(col("__nc")).as("n_ctrl"),
      sum(col("__ct")).as("__ct"), sum(col("__cc")).as("__cc"))
    // bounded-window: fixed-fanout — rolls up the <=nBuckets-row bucket table
    val wQ = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").asc)
    val rt = sdiv(d(col("__ct")), d(col("n_treat")))
    val rc = sdiv(d(col("__cc")), d(col("n_ctrl")))
    perBucket
      .withColumn("__cumCt", sum(col("__ct")).over(wQ))
      .withColumn("__cumCc", sum(col("__cc")).over(wQ))
      .withColumn("__cumNt", sum(col("n_treat")).over(wQ))
      .withColumn("__cumNc", sum(col("n_ctrl")).over(wQ))
      .select(col("bucket"), col("n_treat"), col("n_ctrl"),
        when(col("n_treat") === 0, lit(null).cast("double"))
          .otherwise(round(rt, 6)).as("rate_treat"),
        when(col("n_ctrl") === 0, lit(null).cast("double"))
          .otherwise(round(rc, 6)).as("rate_ctrl"),
        when(col("n_treat") === 0 || col("n_ctrl") === 0,
          lit(null).cast("double"))
          .otherwise(round(rt - rc, 6)).as("uplift"),
        when(col("__cumNc") === 0, lit(null).cast("double"))
          .otherwise(round(d(col("__cumCt")) - d(col("__cumCc")) *
            round(sdiv(d(col("__cumNt")), d(col("__cumNc"))), 9), 6))
          .as("qini"))
  }

  /**
   * Welch's t on a numeric outcome: one row `(n_a, n_b, mean_a, mean_b,
   * t, df)` with `t = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b)` (sample
   * variances) and Welch–Satterthwaite
   * `df = (v_a/n_a + v_b/n_b)² / ((v_a/n_a)²/(n_a−1) + (v_b/n_b)²/(n_b−1))`.
   * NULL outcomes are excluded from their arm. `t`/`df` are NULL when
   * either arm has < 2 values or both variances are 0.
   *
   * Internals: per-arm Σx and Σx² accumulate 9-dp-snapped values as
   * DECIMAL (order-free); mean and E[x²] are single divisions rounded
   * to 9 dp; sample variance is `(E[x²] − m²)·n/(n−1)` rounded to 9 dp
   * — every downstream double op then has bit-identical inputs in both
   * engines.
   */
  def welchT(df: DataFrame, variantCol: String, valueCol: String,
             variantA: String, variantB: String): DataFrame = {
    val v = col(variantCol).cast("string")
    val x = round(col(valueCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    def arm(value: String, suffix: String) = Seq(
      count(when(v === value && x.isNotNull, lit(1))).as(s"n_$suffix"),
      sum(when(v === value, x).cast(dec)).as(s"__s_$suffix"),
      sum(when(v === value, round(x * x, 9)).cast(dec)).as(s"__s2_$suffix"))
    val m = df.agg(arm(variantA, "a").head,
      (arm(variantA, "a").tail ++ arm(variantB, "b")): _*)
    def stats(suffix: String): (Column, Column, Column) = {
      val n = col(s"n_$suffix").cast("double")
      val mean = round(sdiv(col(s"__s_$suffix").cast("double"), n), 9)
      val e2 = round(sdiv(col(s"__s2_$suffix").cast("double"), n), 9)
      // clamp: 9-dp rounding can push a near-constant column's e2-mean²
      // fractionally negative, which would make sqrt(se²) NaN downstream
      val variance =
        greatest(round((e2 - mean * mean) * sdiv(n, n - lit(1.0)), 9), lit(0.0))
      (n, mean, variance)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val sea = sdiv(va, na)
    val seb = sdiv(vb, nb)
    val undef = col("n_a") < 2 || col("n_b") < 2
    val zeroVar = undef || (va + vb) === 0.0
    m.select(
      col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(ma, 6)).as("mean_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(mb, 6)).as("mean_b"),
      when(zeroVar, lit(null).cast("double"))
        .otherwise(round((ma - mb) / sqrt(sea + seb), 6)).as("t"),
      when(zeroVar, lit(null).cast("double"))
        .otherwise(round(sdiv((sea + seb) * (sea + seb),
          sdiv(sea * sea, na - lit(1.0)) + sdiv(seb * seb, nb - lit(1.0))), 6))
        .as("df"))
  }

  /**
   * [[welchT]] PER GROUP, with a two-sided p-value from the NORMAL
   * approximation of the t statistic (`p_normal` — named honestly: at
   * the Welch df this sweep targets, thousands of rows per cell, the
   * normal and t CDFs agree to ~1e-4; at df < 30 prefer the single
   * [[welchT]] + a table). One row per group `(group, n_a, n_b,
   * mean_a, mean_b, t, df, p_normal)`, ready for
   * [[benjaminiHochberg]]. Same guards as the global test, per group.
   *
   * Scale shape: ONE grouped conditional moment pass — the segment
   * count rides the group-by key, not extra scans.
   */
  def welchTGrouped(df: DataFrame, groupCol: String, variantCol: String,
                    valueCol: String, variantA: String,
                    variantB: String): DataFrame = {
    val v = col(variantCol).cast("string")
    val x = round(col(valueCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    def arm(value: String, suffix: String) = Seq(
      count(when(v === value && x.isNotNull, lit(1))).as(s"n_$suffix"),
      sum(when(v === value, x).cast(dec)).as(s"__s_$suffix"),
      sum(when(v === value, round(x * x, 9)).cast(dec)).as(s"__s2_$suffix"))
    val m = df.groupBy(col(groupCol).as("group"))
      .agg(arm(variantA, "a").head,
        (arm(variantA, "a").tail ++ arm(variantB, "b")): _*)
    def stats(suffix: String): (Column, Column, Column) = {
      val n = col(s"n_$suffix").cast("double")
      val mean = round(sdiv(col(s"__s_$suffix").cast("double"), n), 9)
      val e2 = round(sdiv(col(s"__s2_$suffix").cast("double"), n), 9)
      // clamp: 9-dp rounding can push a near-constant column's e2-mean²
      // fractionally negative, which would make sqrt(se²) NaN downstream
      val variance =
        greatest(round((e2 - mean * mean) * sdiv(n, n - lit(1.0)), 9), lit(0.0))
      (n, mean, variance)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val sea = sdiv(va, na)
    val seb = sdiv(vb, nb)
    val t9 = round((ma - mb) / sqrt(sea + seb), 9)
    val undef = col("n_a") < 2 || col("n_b") < 2
    val zeroVar = undef || (va + vb) === 0.0
    m.select(col("group"), col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(ma, 6)).as("mean_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(mb, 6)).as("mean_b"),
      when(zeroVar, lit(null).cast("double"))
        .otherwise(round(t9, 6)).as("t"),
      when(zeroVar, lit(null).cast("double"))
        .otherwise(round(sdiv((sea + seb) * (sea + seb),
          sdiv(sea * sea, na - lit(1.0)) + sdiv(seb * seb, nb - lit(1.0))),
          6)).as("df"),
      when(zeroVar, lit(null).cast("double"))
        .otherwise(round(twoSidedP(t9), 6)).as("p_normal"))
  }

  /**
   * Standard-normal quantile Φ⁻¹(p) (Acklam's rational approximation,
   * |ε| < 1.15e-9), snapped to 9 dp — a DRIVER-side constant for
   * α/power knobs, never a per-row expression.
   */
  private[graft] def normalQuantile(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    val x =
      if (p < pl) {
        val q = math.sqrt(-2.0 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1.0)
      } else if (p <= 1.0 - pl) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
      } else {
        val q = math.sqrt(-2.0 * math.log(1.0 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1.0)
      }
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /**
   * Minimum detectable effect + required sample size: "could this test
   * even have seen the lift you care about?" — the pre/post-mortem
   * every underpowered A/B needs. From the two arms' observed
   * variances: `mde_abs = (z_{α/2} + z_β)·√(v_a/n_a + v_b/n_b)` (the
   * smallest true |Δmeans| detected with the requested power),
   * `mde_rel` = mde_abs / mean_a, and `n_required` = the per-arm n
   * for the OBSERVED |Δ| to reach that power,
   * `⌈(z_{α/2}+z_β)²·(v_a+v_b)/Δ²⌉`. One row: `(n_a, n_b, mean_a,
   * mean_b, mde_abs, mde_rel, n_required)`; guards NULL the stats
   * when an arm has < 2 values, `mde_rel` when mean_a = 0, and
   * `n_required` when the observed Δ = 0.
   *
   * The z quantiles are DRIVER-computed constants ([[normalQuantile]],
   * 9 dp) folded into the plan — α/power are configuration, not data,
   * so no per-row special function is needed.
   *
   * Scale shape: identical to [[welchT]] — ONE map-side-combined
   * moment pass, one scalar row out; stream-legal.
   */
  def minDetectableEffect(df: DataFrame, variantCol: String,
                          valueCol: String, variantA: String,
                          variantB: String, alpha: Double = 0.05,
                          power: Double = 0.8): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(power > 0.0 && power < 1.0, s"power must be in (0,1), got $power")
    val v = col(variantCol).cast("string")
    val x = round(col(valueCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    val zsum = BigDecimal(normalQuantile(1.0 - alpha / 2.0) +
      normalQuantile(power))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def arm(value: String, suffix: String) = Seq(
      count(when(v === value && x.isNotNull, lit(1))).as(s"n_$suffix"),
      sum(when(v === value, x).cast(dec)).as(s"__s_$suffix"),
      sum(when(v === value, round(x * x, 9)).cast(dec)).as(s"__s2_$suffix"))
    val m = df.agg(arm(variantA, "a").head,
      (arm(variantA, "a").tail ++ arm(variantB, "b")): _*)
    def stats(suffix: String): (Column, Column, Column) = {
      val n = col(s"n_$suffix").cast("double")
      val mean = round(sdiv(col(s"__s_$suffix").cast("double"), n), 9)
      val e2 = round(sdiv(col(s"__s2_$suffix").cast("double"), n), 9)
      // clamp: 9-dp rounding can push a near-constant column's e2-mean²
      // fractionally negative, which would make sqrt(se²) NaN downstream
      val variance =
        greatest(round((e2 - mean * mean) * sdiv(n, n - lit(1.0)), 9), lit(0.0))
      (n, mean, variance)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val undef = col("n_a") < 2 || col("n_b") < 2
    val mde = round(lit(zsum) *
      round(sqrt(greatest(round(sdiv(va, na) + sdiv(vb, nb), 9),
        lit(0.0))), 9), 9)
    val delta = round(ma - mb, 9)
    val nReq = ceil(round(sdiv(
      round(lit(zsum) * lit(zsum) * round(va + vb, 9), 9),
      round(delta * delta, 9)), 9)).cast("long")
    m.select(
      col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(ma, 6)).as("mean_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(mb, 6)).as("mean_b"),
      when(undef, lit(null).cast("double"))
        .otherwise(pub6(mde)).as("mde_abs"),
      when(undef || ma === 0.0, lit(null).cast("double"))
        .otherwise(round(sdiv(mde, abs(ma)), 6)).as("mde_rel"),
      when(undef || delta === 0.0, lit(null).cast("long"))
        .otherwise(nReq).as("n_required"))
  }

  /**
   * Proportion-metric MDE: [[minDetectableEffect]] for conversion
   * rates — `mde_abs = (z_{α/2}+z_β)·√(p̂_aq̂_a/n_a + p̂_bq̂_b/n_b)`
   * on the observed rates (NULL success = failure, as
   * [[proportionZ]]), plus the per-arm `n_required` for the OBSERVED
   * lift. One row: `(n_a, n_b, conv_a, conv_b, mde_abs, n_required)`;
   * guards NULL the stats when an arm is empty, mde when both rates
   * are degenerate (0 or 1 → zero variance), and n_required when the
   * lift is 0.
   *
   * Same single-pass scalar shape and driver-side z constants as the
   * means version.
   */
  def minDetectableEffectProportion(df: DataFrame, variantCol: String,
                                    successCol: String, variantA: String,
                                    variantB: String, alpha: Double = 0.05,
                                    power: Double = 0.8): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    require(power > 0.0 && power < 1.0, s"power must be in (0,1), got $power")
    val v = col(variantCol).cast("string")
    val s = coalesce(col(successCol).cast("boolean"), lit(false))
    val zsum = BigDecimal(normalQuantile(1.0 - alpha / 2.0) +
      normalQuantile(power))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m = df.agg(
      count(when(v === variantA, lit(1))).as("n_a"),
      count(when(v === variantA && s, lit(1))).as("__k_a"),
      count(when(v === variantB, lit(1))).as("n_b"),
      count(when(v === variantB && s, lit(1))).as("__k_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = round(sdiv(col("__k_a").cast("double"), na), 9)
    val pb = round(sdiv(col("__k_b").cast("double"), nb), 9)
    val va = round(pa * round(lit(1.0) - pa, 9), 9)
    val vb = round(pb * round(lit(1.0) - pb, 9), 9)
    val se2 = round(sdiv(va, na) + sdiv(vb, nb), 9)
    val mde = round(lit(zsum) * round(sqrt(greatest(se2, lit(0.0))), 9), 9)
    val delta = round(pa - pb, 9)
    val nReq = ceil(round(sdiv(
      round(lit(zsum) * lit(zsum) * round(va + vb, 9), 9),
      round(delta * delta, 9)), 9)).cast("long")
    val empty = col("n_a") === 0 || col("n_b") === 0
    m.select(col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(pa, 6)).as("conv_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(pb, 6)).as("conv_b"),
      when(empty || (va + vb) === 0.0, lit(null).cast("double"))
        .otherwise(pub6(mde)).as("mde_abs"),
      when(empty || (va + vb) === 0.0 || delta === 0.0,
        lit(null).cast("long"))
        .otherwise(nReq).as("n_required"))
  }

  /**
   * Two-sided normal p-value `2(1−Φ(|z|))`, which collapses to
   * `S(t)·e^(−z²/2)` under the Abramowitz & Stegun 7.1.26 erf
   * approximation (|ε| < 1.5·10⁻⁷ on erf, < 10⁻⁶ on the two-sided p —
   * below the 6-dp publish grid): with `y = |z|/√2`,
   * `t = 1/(1 + 0.3275911·y)`,
   * `p = (a₁t + a₂t² + a₃t³ + a₄t⁴ + a₅t⁵)·e^(−y²)`. Pure
   * arithmetic plus one `exp` — expressible identically in the DuckDB
   * oracle, unlike the exact Φ. Snapping: 1/√2 folds at 9 dp; y, t,
   * the Horner polynomial, the exponent, e, and p each snap to 9 dp
   * (the [[graft.operators.Timeseries.ewma]] ln/exp discipline).
   */
  private[graft] def twoSidedP(z: Column): Column = {
    val y = round(abs(z) * lit(0.707106781), 9)
    val t = round(lit(1.0) / (lit(1.0) + lit(0.3275911) * y), 9)
    val poly = round(t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) +
        t * lit(1.061405429))))), 9)
    val e = round(exp(round(lit(0.0) - y * y, 9)), 9)
    round(poly * e, 9)
  }

  /**
   * [[proportionZ]] PER GROUP — the "run the same test across every
   * segment/metric" sweep that makes multiple-testing correction
   * necessary: one row per group with the two-proportion pooled z AND
   * its two-sided p-value (via [[twoSidedP]]), ready for
   * [[benjaminiHochberg]]. Same NULL guards as the global test,
   * per group.
   *
   * Scale shape: ONE map-side-combined conditional-aggregate pass with
   * the group key — testing 10 000 segments costs the same single
   * corpus scan as testing one.
   */
  def proportionZGrouped(df: DataFrame, groupCol: String,
                         variantCol: String, successCol: String,
                         variantA: String, variantB: String): DataFrame = {
    val v = col(variantCol).cast("string")
    val s = coalesce(col(successCol).cast("boolean"), lit(false))
    val m = df.groupBy(col(groupCol).as("group")).agg(
      count(when(v === variantA, lit(1))).as("n_a"),
      count(when(v === variantA && s, lit(1))).as("__k_a"),
      count(when(v === variantB, lit(1))).as("n_b"),
      count(when(v === variantB && s, lit(1))).as("__k_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = sdiv(col("__k_a").cast("double"), na)
    val pb = sdiv(col("__k_b").cast("double"), nb)
    val ph = sdiv((col("__k_a") + col("__k_b")).cast("double"),
      (col("n_a") + col("n_b")).cast("double"))
    val z9 = round((pa - pb) /
      sqrt((ph * (lit(1.0) - ph)) *
        (sdiv(lit(1.0), na) + sdiv(lit(1.0), nb))), 9)
    val degenerate = col("n_a") === 0 || col("n_b") === 0 ||
      col("__k_a") + col("__k_b") === 0 ||
      col("__k_a") + col("__k_b") === col("n_a") + col("n_b")
    m.select(col("group"), col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(pa, 6)).as("conv_a"),
      when(col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(pb, 6)).as("conv_b"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(z9, 6)).as("z"),
      when(degenerate, lit(null).cast("double"))
        .otherwise(round(twoSidedP(z9), 6)).as("p_value"))
  }

  /**
   * Benjamini–Hochberg FDR step-up over a table of per-test p-values —
   * what keeps a 10 000-segment sweep from "discovering" 500 false
   * positives at α = 0.05: adjusted `q_i = min_{j ≥ i} (p_j · m / j)`
   * (capped at 1) over the (p ASC, key ASC) ranking, `significant ⇔
   * q ≤ α` (exactly the classic "largest k with p_k ≤ k·α/m" rule).
   * NULL p-values (degenerate tests) are excluded — they neither count
   * in m nor can be discoveries.
   *
   * Runs AFTER the corpus has reduced to one row per test, so the
   * global ordering windows see an |tests|-sized frame — fine at any
   * corpus scale; it is the number of HYPOTHESES that bounds this
   * operator.
   */
  def benjaminiHochberg(df: DataFrame, keyCol: String, pCol: String,
                        alpha: Double = 0.05): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    import org.apache.spark.sql.expressions.Window
    // bounded-window: rules — one row per hypothesis (|tests|-sized, scaladoc above)
    val w = Window.orderBy(col(pCol).asc, col(keyCol).asc)
    val all = Window.partitionBy()
    val wTail = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.where(col(pCol).isNotNull)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__m", count(lit(1)).over(all))
      .withColumn("__qraw", round(col(pCol) * col("__m").cast("double") /
        col("rank").cast("double"), 9))
      .withColumn("__q", least(min(col("__qraw")).over(wTail), lit(1.0)))
      .select(col(keyCol), col(pCol), col("rank"),
        round(col("__q"), 6).as("q_value"),
        (col("__q") <= alpha).as("significant"))
  }

  /**
   * Always-valid mSPRT (mixture sequential probability ratio test,
   * Johari et al. 2017) for a mean difference: the likelihood ratio
   * you may peek at after EVERY event without inflating false
   * positives — the fixed-n [[welchT]]'s sequential sibling. With
   * `V = v_a/n_a + v_b/n_b` (the observed variance of the lift) and a
   * N(0, τ²) mixture over effects,
   * `ln Λ = ½·ln(V/(V+τ²)) + Δ̂²τ²/(2V(V+τ²))`, and the always-valid
   * p-value is `min(1, 1/Λ)`. One row: `(n_a, n_b, lift, se2,
   * log_lambda, p_always)` — `log_lambda` published (Λ itself
   * overflows once the evidence is strong). NULL when an arm has < 2
   * values or V = 0.
   *
   * τ is a DRIVER-side tuning constant (snap 9 dp) — pick it near the
   * effect size worth detecting; the test stays valid for any choice.
   * Same one-pass moment reduce as [[welchT]]; ln/exp follow the
   * [[Timeseries.ewma]] 9-dp discipline.
   */
  def msprt(df: DataFrame, variantCol: String, valueCol: String,
            variantA: String, variantB: String,
            tau: Double = 1.0): DataFrame = {
    require(tau > 0.0, s"tau must be > 0, got $tau")
    val t2 = BigDecimal(tau * tau)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v = col(variantCol).cast("string")
    val x = round(col(valueCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    def arm(value: String, suffix: String) = Seq(
      count(when(v === value && x.isNotNull, lit(1))).as(s"n_$suffix"),
      sum(when(v === value, x).cast(dec)).as(s"__s_$suffix"),
      sum(when(v === value, round(x * x, 9)).cast(dec)).as(s"__s2_$suffix"))
    val m = df.agg(arm(variantA, "a").head,
      (arm(variantA, "a").tail ++ arm(variantB, "b")): _*)
    def stats(suffix: String): (Column, Column, Column) = {
      val n = col(s"n_$suffix").cast("double")
      val mean = round(sdiv(col(s"__s_$suffix").cast("double"), n), 9)
      val e2 = round(sdiv(col(s"__s2_$suffix").cast("double"), n), 9)
      // clamp: 9-dp rounding can push a near-constant column's e2-mean²
      // fractionally negative, which would make sqrt(se²) NaN downstream
      val variance =
        greatest(round((e2 - mean * mean) * sdiv(n, n - lit(1.0)), 9), lit(0.0))
      (n, mean, variance)
    }
    val (na, ma, va) = stats("a")
    val (nb, mb, vb) = stats("b")
    val bigV = round(sdiv(va, na) + sdiv(vb, nb), 9)
    val delta = round(ma - mb, 9)
    val vpt = round(bigV + lit(t2), 9)
    // ½·ln(x) as ln(√x): halving a 9-dp decimal lands EXACTLY on a
    // half-tie at digit 10 every other time — ln∘sqrt keeps the value
    // transcendental until its single snap. The V=0 guard keeps ln's
    // argument positive even in the NULLed branch (engines differ on
    // ln(0): NULL vs hard error)
    val term1 = round(log(sqrt(sdiv(
      when(bigV === 0.0, lit(1.0)).otherwise(bigV), vpt))), 9)
    val term2 = round(sdiv(round(round(delta * delta, 9) * lit(t2), 9),
      round(lit(2.0) * bigV * vpt, 9)), 9)
    val lnl = round(term1 + term2, 9)
    val undef = col("n_a") < 2 || col("n_b") < 2 || bigV === 0.0
    m.select(col("n_a"), col("n_b"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
        .otherwise(pub6(delta)).as("lift"),
      when(undef, lit(null).cast("double"))
        .otherwise(pub6(bigV)).as("se2"),
      when(undef, lit(null).cast("double"))
        .otherwise(pub6(lnl)).as("log_lambda"),
      when(undef, lit(null).cast("double"))
        .otherwise(when(lnl <= 0.0, lit(1.0))
          .otherwise(round(exp(lit(0.0) - lnl), 6))).as("p_always"))
  }

  /**
   * Mann–Whitney U (Wilcoxon rank-sum) with the normal approximation
   * and tie correction — the nonparametric Welch: compares the two
   * arms' value DISTRIBUTIONS by rank, so a heavy-tailed metric
   * (revenue, latency) can't hand the verdict to a few whales. One
   * row: `(n_a, n_b, rank_sum_a, u_a, z)` where ties take average
   * ranks, `z = (U_A − n_An_B/2) / σ` with the tie-corrected
   * `σ² = n_An_B/12 · ((n+1) − Σ(t³−t)/(n(n−1)))`. `z` is NULL when
   * either arm is empty or every value ties (σ = 0).
   *
   * Scale shape: the corpus reduces in ONE map-side-combined pass to
   * per-VALUE cells with per-arm counts, where a "value" is the metric
   * QUANTIZED TO 6 DECIMAL PLACES (the [[Eval.aucRoc]] tie
   * discipline: quantization only ever MERGES ties, which the
   * tie-correction term absorbs exactly, and 6-dp rank statistics are
   * statistically indistinguishable from exact ranks for any real
   * metric). The cumulative rank walk over the cell table runs
   * through [[graft.plans.CumWalk]] — sampled range boundaries,
   * per-bucket offsets, partitioned in-bucket walk — so a WIDE-RANGE
   * continuous metric (latency in µs, micro-unit revenue: ~10¹¹
   * six-dp cells over [0, 10⁵]) still never lands on one reducer;
   * the cell table may grow corpus-sized and the plan stays
   * partition-parallel (average ranks come out of cumulative cell
   * counts, identical to ranking raw rows). The test then folds the
   * cells to one scalar row. Tie cubes accumulate as DECIMAL(38,0)
   * so a million-row tie can't overflow.
   *
   * Determinism: average ranks and rank-sum terms snap to 9 dp and
   * accumulate as DECIMAL; the z pipeline is fixed-shape double
   * arithmetic at 9 dp, published at 6 dp.
   */
  def mannWhitney(df: DataFrame, variantCol: String, valueCol: String,
                  variantA: String, variantB: String): DataFrame = {
    val v = col(variantCol).cast("string")
    val dec = "decimal(28,9)"
    def d(c: Column) = c.cast("double")
    val cells = df
      .where(col(valueCol).isNotNull && v.isin(variantA, variantB))
      .groupBy(round(col(valueCol).cast("double"), 6).as("__v"))
      .agg(count(when(v === variantA, lit(1))).as("__ca"),
        count(when(v === variantB, lit(1))).as("__cb"))
    // two-pass distributed cumulative count over the cell table — no
    // single-reducer window however wide the metric's range (CumWalk)
    val ranked = graft.plans.CumWalk.walk(
      cells.withColumn("__c", col("__ca") + col("__cb")),
      "__v", asc = true, Seq(graft.plans.CumWalk.CumSum("__c", "__cum")))
      .withColumn("__avgr",
        round(d(col("__cum") - col("__c")) + (d(col("__c")) + lit(1.0)) /
          lit(2.0), 9))
    val m = ranked.agg(
      sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
      sum(round(col("__avgr") * d(col("__ca")), 9).cast(dec)).as("__ra"),
      // cast each factor to decimal BEFORE multiplying: a tie group of
      // ~2.1M+ rows would overflow the LONG cube c*c*c even though the
      // running sum is decimal
      sum {
        val cDec = col("__c").cast("decimal(38,0)")
        cDec * cDec * cDec - cDec
      }.as("__t3"))
    val na = d(col("n_a"))
    val nb = d(col("n_b"))
    val n = na + nb
    val ra = col("__ra").cast("double")
    val ua = round(ra - round(na * (na + lit(1.0)) / lit(2.0), 9), 9)
    val mu = round(na * nb / lit(2.0), 9)
    val corr = round(n + lit(1.0) -
      sdiv(col("__t3").cast("double"), round(n * (n - lit(1.0)), 9)), 9)
    val s2 = round(na * nb / lit(12.0) * corr, 9)
    val sg = round(sqrt(greatest(s2, lit(0.0))), 9)
    m.select(col("n_a"), col("n_b"),
      when(col("n_a") === 0, lit(null).cast("double"))
        .otherwise(round(ra, 6)).as("rank_sum_a"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null).cast("double"))
        .otherwise(round(ua, 6)).as("u_a"),
      when(col("n_a") === 0 || col("n_b") === 0 || sg === 0.0,
        lit(null).cast("double"))
        .otherwise(round(sdiv(ua - mu, sg), 6)).as("z"))
  }

  /**
   * Difference-in-differences: the quasi-experimental lift estimate
   * when assignment wasn't randomized but a pre-period exists —
   * DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre), with the
   * large-sample normal z from the four cells' variance sum
   * (se² = Σ vᵢ/nᵢ; the parallel-trends assumption is the caller's to
   * defend). One row: `(n_treat_pre, n_treat_post, n_ctrl_pre,
   * n_ctrl_post, did, se, z)`; `z` NULL when any cell has < 2 values
   * or all variances are 0.
   *
   * Scale shape: ONE map-side-combined pass — a single wide aggregate
   * of 4×(count, Σx, Σx²) conditional cells, one scalar row out; no
   * join, no window, stream-legal as a snapshot aggregate. Same 9-dp /
   * DECIMAL / 6-dp discipline as [[welchT]].
   */
  def did(df: DataFrame, groupCol: String, periodCol: String,
          metricCol: String, treatValue: String, controlValue: String,
          preValue: String, postValue: String): DataFrame = {
    val g = col(groupCol).cast("string")
    val p = col(periodCol).cast("string")
    val x = round(col(metricCol).cast("double"), 9)
    val dec = "decimal(28,9)"
    def cell(gv: String, pv: String, sfx: String) = {
      val in = g === gv && p === pv && x.isNotNull
      Seq(count(when(in, lit(1))).as(s"n_$sfx"),
        sum(when(in, x).cast(dec)).as(s"__s_$sfx"),
        sum(when(in, round(x * x, 9)).cast(dec)).as(s"__s2_$sfx"))
    }
    val aggs = cell(treatValue, preValue, "treat_pre") ++
      cell(treatValue, postValue, "treat_post") ++
      cell(controlValue, preValue, "ctrl_pre") ++
      cell(controlValue, postValue, "ctrl_post")
    val m = df.agg(aggs.head, aggs.tail: _*)
    def d(c: Column) = c.cast("double")
    def stats(sfx: String): (Column, Column, Column) = {
      val n = d(col(s"n_$sfx"))
      val mean = round(sdiv(col(s"__s_$sfx").cast("double"), n), 9)
      val e2 = round(sdiv(col(s"__s2_$sfx").cast("double"), n), 9)
      // clamp: 9-dp rounding can push a near-constant column's e2-mean²
      // fractionally negative, which would make sqrt(se²) NaN downstream
      val variance =
        greatest(round((e2 - mean * mean) * sdiv(n, n - lit(1.0)), 9), lit(0.0))
      (n, mean, variance)
    }
    val (ntp, mtp, vtp) = stats("treat_pre")
    val (ntq, mtq, vtq) = stats("treat_post")
    val (ncp, mcp, vcp) = stats("ctrl_pre")
    val (ncq, mcq, vcq) = stats("ctrl_post")
    val didv = round(mtq - mtp - (mcq - mcp), 9)
    val se2 = round(sdiv(vtp, ntp) + sdiv(vtq, ntq) + sdiv(vcp, ncp) +
      sdiv(vcq, ncq), 9)
    val se = round(sqrt(greatest(se2, lit(0.0))), 9)
    val undef = col("n_treat_pre") < 2 || col("n_treat_post") < 2 ||
      col("n_ctrl_pre") < 2 || col("n_ctrl_post") < 2
    m.select(col("n_treat_pre"), col("n_treat_post"), col("n_ctrl_pre"),
      col("n_ctrl_post"),
      when(undef, lit(null).cast("double"))
        .otherwise(round(didv, 6)).as("did"),
      when(undef, lit(null).cast("double"))
        .otherwise(round(se, 6)).as("se"),
      when(undef || se === 0.0, lit(null).cast("double"))
        .otherwise(round(sdiv(didv, se), 6)).as("z"))
  }
}
