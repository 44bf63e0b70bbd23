package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Survival analysis over right-censored durations — the
 * retention/churn companion to [[Experiment]]: instead of a snapshot
 * conversion rate, model WHEN the event happens and treat subjects
 * who haven't converted/churned yet as censored rather than failures.
 *
 *  - [[kaplanMeier]]: the product-limit estimator S(t) = Π(1 − dᵗ/nᵗ)
 *    per group — the standard nonparametric survival curve;
 *  - [[nelsonAalen]]: the cumulative-hazard estimator H(t) = Σ dᵗ/nᵗ
 *    and its Fleming–Harrington survival exp(−H(t)) — the variant
 *    that stays finite when a risk set dies out;
 *  - [[logRank]]: the Mantel–Cox test comparing two groups' curves —
 *    structurally [[Experiment.cmh]] with event times as the strata.
 *
 * Scale shape: the corpus pass is ONE map-side-combined groupBy to
 * per-(group, t) death/censor cells; every cumulative walk after that
 * runs on the AGGREGATED time grid through [[graft.plans.CumWalk]]
 * (sampled range boundaries → per-bucket offsets → partitioned
 * in-bucket walk), so even a single group with CONTINUOUS wide-range
 * durations — where the grid approaches corpus size — never lands on
 * one reducer. No self-join, no corpus window.
 *
 * Float determinism: the survival product is computed in log space —
 * per-step terms snap to 9 dp, ln(term) snaps to 9 dp, steps
 * accumulate as DECIMAL (order-free), and the final exp rounds to
 * 6 dp — the same ln/exp discipline [[Eval.corpusBleu]]'s oracle
 * already proved cross-engine exact. A step that drives survival to
 * exactly 0 (dᵗ = nᵗ) is flagged and forces 0 downstream instead of
 * passing −∞ through ln.
 */
object Survival {

  /** Total division: ANSI-safe under codegen subexpression hoisting —
    * see [[Experiment]]'s sdiv for the rationale. */
  private def sdiv(a: Column, b: Column): Column =
    a / when(b === 0.0, lit(1.0)).otherwise(b)

  private val dec = "decimal(28,9)"

  /**
   * Kaplan–Meier product-limit curve per group. Input is one row per
   * SUBJECT: `durationCol` (numeric time-to-event/censoring, NULL rows
   * drop) and `eventCol` (boolean: true = event observed, false/NULL =
   * censored). Output is one row per (group, event time):
   * `(group, t, at_risk, events, survival)` — times where no event
   * occurred (pure censoring) don't emit a row but still shrink the
   * risk set, exactly the textbook estimator.
   */
  /** Shared reduction: subjects → the per-(group, event-time) grid
    * `(group, t, at_risk, events)`, censor-only times removed (they
    * still shrink the risk set). ONE corpus shuffle; everything after
    * is grid-sized. */
  private def eventSteps(df: DataFrame, groupCol: String,
                         durationCol: String, eventCol: String): DataFrame = {
    val e = coalesce(col(eventCol).cast("boolean"), lit(false))
    val cells = df
      .where(col(durationCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("group"),
        col(durationCol).cast("double").as("t"))
      .agg(count(when(e, lit(1))).as("events"),
        count(when(!e, lit(1))).as("__cens"))
    // risk sets via CumWalk (not a per-group ordered window): one
    // giant group with wide-range continuous durations would otherwise
    // put the whole grid on one reducer; group totals are a grid-sized
    // aggregate joined back — computed over the WALKED frame (whose
    // cell table CumWalk materialized), not the raw cells, so the
    // corpus aggregation beneath the grid runs exactly once
    val walked = graft.plans.CumWalk.walk(
      cells.withColumn("__sz", col("events") + col("__cens")),
      "t", asc = true, Seq(graft.plans.CumWalk.CumSum("__sz", "__cumsz")),
      partitionCols = Seq("group"))
    val totals = walked.groupBy("group").agg(sum(col("__sz")).as("__n"))
    walked
      .join(totals, "group")
      .withColumn("at_risk", col("__n") - col("__cumsz") + col("__sz"))
      .where(col("events") > 0)
      .drop("__sz", "__cumsz")
  }

  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val steps = eventSteps(df, groupCol, durationCol, eventCol)
      .withColumn("__term",
        round(lit(1.0) - sdiv(col("events").cast("double"),
          col("at_risk").cast("double")), 9))
      .withColumn("__dead0", col("__term") === 0.0)
      .withColumn("__lterm",
        when(col("__term") > 0.0, round(log(col("__term")), 9).cast(dec))
          .otherwise(lit(0.0).cast(dec)))
    graft.plans.CumWalk.walk(steps, "t", asc = true,
        Seq(graft.plans.CumWalk.CumMax("__dead0", "__dead"),
          graft.plans.CumWalk.CumSum("__lterm", "__logsum")),
        partitionCols = Seq("group"))
      .select(col("group"), col("t"), col("at_risk"), col("events"),
        when(col("__dead"), lit(0.0))
          .otherwise(round(exp(col("__logsum").cast("double")), 6))
          .as("survival"))
  }

  /**
   * Nelson–Aalen cumulative hazard per group: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ
   * over the same subject-level input as [[kaplanMeier]]. Output is
   * `(group, t, at_risk, events, cum_hazard, survival_fh)` where
   * `survival_fh = exp(−H(t))` is the Fleming–Harrington survival
   * estimate — unlike the product-limit curve it never hits exact 0,
   * so it stays informative past a dᵗ = nᵗ step. Per-step hazards
   * snap to 9 dp and accumulate as DECIMAL (order-free); published
   * values round to 6 dp.
   */
  def nelsonAalen(df: DataFrame, groupCol: String, durationCol: String,
                  eventCol: String): DataFrame = {
    val steps = eventSteps(df, groupCol, durationCol, eventCol)
      .withColumn("__h", round(sdiv(col("events").cast("double"),
        col("at_risk").cast("double")), 9).cast(dec))
    graft.plans.CumWalk.walk(steps, "t", asc = true,
        Seq(graft.plans.CumWalk.CumSum("__h", "__hsum")),
        partitionCols = Seq("group"))
      .select(col("group"), col("t"), col("at_risk"), col("events"),
        round(col("__hsum").cast("double"), 6).as("cum_hazard"),
        round(exp(-col("__hsum").cast("double")), 6).as("survival_fh"))
  }

  /**
   * Two-group log-rank (Mantel–Cox) test. Same subject-level input as
   * [[kaplanMeier]] plus the two group labels to compare (other groups
   * drop). One row: `(n_times, n_a, n_b, observed_a, expected_a,
   * chi2)` — observed vs expected events in group A under the pooled
   * hazard, with the hypergeometric variance per event time; `chi2` is
   * NULL when the variance sum is 0 (no information, e.g. one group
   * empty). Single-subject risk sets contribute expectation but zero
   * variance, mirroring [[Experiment.cmh]].
   *
   * Scale shape: durations QUANTIZE TO 6 DP before the per-time cell
   * reduce (the [[Experiment.mannWhitney]]/aucRoc tie discipline —
   * event-time ties at 6 dp merge into one risk-set step, the
   * standard handling of tied survival times), and the event-time
   * risk-set walk runs through [[graft.plans.CumWalk]], so a
   * continuous wide-range duration (a corpus-sized cell table) stays
   * partition-parallel instead of collapsing onto one reducer.
   */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String, groupA: String, groupB: String)
      : DataFrame = {
    val g = col(groupCol).cast("string")
    val e = coalesce(col(eventCol).cast("boolean"), lit(false))
    val cells = df
      .where(col(durationCol).isNotNull && g.isin(groupA, groupB))
      .groupBy(round(col(durationCol).cast("double"), 6).as("t"))
      .agg(
        count(when(g === groupA && e, lit(1))).as("d_a"),
        count(when(g === groupA, lit(1))).as("r_a"),
        count(when(g === groupB && e, lit(1))).as("d_b"),
        count(when(g === groupB, lit(1))).as("r_b"))
    // risk-set walk via CumWalk (partition-parallel however wide the
    // duration range); arm totals are a 1-row broadcast aggregate over
    // the WALKED frame (materialized cells) — aggregating the raw
    // cells here would re-run the corpus reduce a second time
    val walked = graft.plans.CumWalk.walk(cells, "t", asc = true,
      Seq(graft.plans.CumWalk.CumSum("r_a", "__cra"),
        graft.plans.CumWalk.CumSum("r_b", "__crb")))
    val totals = walked.agg(sum(col("r_a")).as("n_a_tot"),
      sum(col("r_b")).as("n_b_tot"))
    val times = walked
      .crossJoin(broadcast(totals))
      .withColumn("n1", col("n_a_tot") - col("__cra") + col("r_a"))
      .withColumn("n2", col("n_b_tot") - col("__crb") + col("r_b"))
      .where(col("d_a") + col("d_b") > 0)
    def d(c: Column) = c.cast("double")
    val dt = d(col("d_a") + col("d_b"))
    val nt = d(col("n1") + col("n2"))
    val e1 = round(sdiv(dt * d(col("n1")), nt), 9)
    val v = when(col("n1") + col("n2") < 2, lit(0.0))
      .otherwise(round(sdiv(
        dt * d(col("n1")) * d(col("n2")) * (nt - dt),
        nt * nt * (nt - lit(1.0))), 9))
    val m = times.agg(
      count(lit(1)).as("n_times"),
      max(col("n_a_tot")).as("n_a"),
      max(col("n_b_tot")).as("n_b"),
      sum(col("d_a")).as("observed_a"),
      sum(e1.cast(dec)).as("__e"),
      sum(v.cast(dec)).as("__v"))
    val dev = col("observed_a").cast("double") - col("__e").cast("double")
    m.select(col("n_times"), col("n_a"), col("n_b"), col("observed_a"),
      round(col("__e").cast("double"), 6).as("expected_a"),
      when(col("__v").cast("double") === 0.0, lit(null).cast("double"))
        .otherwise(round(dev * dev /
          when(col("__v").cast("double") === 0.0, lit(1.0))
            .otherwise(col("__v").cast("double")), 6)).as("chi2"))
  }
}
