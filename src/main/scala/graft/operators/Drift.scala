package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distribution drift between two corpus versions — the monitoring half of
 * [[Snapshot]]: when the language/source/score-bucket mixture of the new
 * snapshot shifts, a retrained model inherits the shift, so pipelines
 * gate on a divergence threshold before promoting data.
 *
 * Jensen-Shannon divergence (symmetric, bounded by ln 2, finite even
 * when a value exists on only one side — KL's blind spot) over the two
 * empirical distributions of a categorical column.
 *
 * Float determinism: counts are exact; each probability is one exact
 * int/int double division; each value's JS contribution rounds to 9 dp
 * and sums as DECIMAL(20,9) (associative — partitioning can't move the
 * hash), and the final figure rounds to 6 dp — the SparkEntry policy.
 *
 * Scale shape: two map-side-combined value counts (|domain|-sized), a
 * full-outer join on the value key, totals derived from the counts
 * themselves. Corpus rows are touched exactly once per side; everything
 * after is domain-sized.
 */
object Drift {

  /** Per-value comparison: `(value, n_a, n_b, p_a, p_b)` — probabilities
    * rounded to 6 dp, absent values present with zeros (that IS the
    * drift). NULL category values count as a real level. */
  def categoricalDetail(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    joined(a, b, valueCol)
      .select(col("value"), col("n_a"), col("n_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"))

  /** One-row summary: `(n_values, js)` — JS divergence in nats, ≤ ln 2. */
  def jsDivergence(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val m = (col("p_a") + col("p_b")) / lit(2.0)
    val term = (c: org.apache.spark.sql.Column) =>
      when(c > 0, c * log(c / m)).otherwise(lit(0.0))
    joined(a, b, valueCol)
      .withColumn("w", round(
        lit(0.5) * term(col("p_a")) + lit(0.5) * term(col("p_b")), 9))
      .agg(count(lit(1)).as("n_values"),
        round(sum(col("w").cast("decimal(20,9)")).cast("double"), 6).as("js"))
  }

  /**
   * Numeric drift: JS divergence over a fixed-width binning of a numeric
   * column — same clamped floor arithmetic as `Profile.histogram`, so
   * both engines bin identically; explicit [lo, hi) bounds, NO min/max
   * pre-pass (that would double the scans AND make the binning depend on
   * the data being compared). NULLs are excluded (they are a
   * completeness concern — diff their counts via [[categoricalDetail]]).
   */
  def numericJs(a: DataFrame, b: DataFrame, valueCol: String,
                lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, "need hi > lo and at least one bin")
    val width = (hi - lo) / nBins
    def binned(df: DataFrame) = df
      .where(col(valueCol).isNotNull)
      .select(least(greatest(
        floor((col(valueCol).cast("double") - lit(lo)) / lit(width)), lit(0)),
        lit(nBins - 1)).cast("long").as("bin"))
    jsDivergence(binned(a), binned(b), "bin")
  }

  /**
   * Population Stability Index — the model-monitoring drift number
   * (credit-scoring convention: < 0.1 stable, 0.1–0.25 shifting,
   * > 0.25 act): PSI = Σ_v (p_a − p_b)·ln(p_a/p_b) over the value
   * domain, with zero proportions floored at `epsilon` (the standard
   * substitution — PSI is undefined at 0, and a level that vanished
   * IS the signal, so it must contribute a large finite term, not ∞ or
   * a dropped row). One row: `(n_values, psi)`.
   *
   * Complements [[jsDivergence]] on the same domain reduce: JS is
   * bounded (≤ ln 2) and symmetric-smoothed — good for dashboards; PSI
   * is the unbounded industry threshold number. Same scale shape: one
   * groupBy per side to domain-sized count tables, a full-outer join,
   * 9-dp terms in decimal, 6-dp output.
   */
  def psi(a: DataFrame, b: DataFrame, valueCol: String,
          epsilon: Double = 1e-4): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val pa = greatest(round(col("p_a"), 9), lit(epsilon))
    val pb = greatest(round(col("p_b"), 9), lit(epsilon))
    joined(a, b, valueCol)
      .withColumn("w", round((pa - pb) * log(pa / pb), 9))
      .agg(count(lit(1)).as("n_values"),
        round(sum(col("w").cast("decimal(20,9)")).cast("double"), 6).as("psi"))
  }

  /** Numeric PSI over the same fixed binning as [[numericJs]]. */
  def numericPsi(a: DataFrame, b: DataFrame, valueCol: String,
                 lo: Double, hi: Double, nBins: Int,
                 epsilon: Double = 1e-4): DataFrame = {
    require(nBins >= 1 && hi > lo, "need hi > lo and at least one bin")
    val width = (hi - lo) / nBins
    def binned(df: DataFrame) = df
      .where(col(valueCol).isNotNull)
      .select(least(greatest(
        floor((col(valueCol).cast("double") - lit(lo)) / lit(width)), lit(0)),
        lit(nBins - 1)).cast("long").as("bin"))
    psi(binned(a), binned(b), "bin", epsilon)
  }

  /**
   * Two-sample Kolmogorov–Smirnov statistic over a numeric column:
   * `D = max_x |F_a(x) − F_b(x)|` between the two empirical CDFs — the
   * binning-free companion to [[numericJs]]/[[numericPsi]] (no lo/hi/
   * nBins to tune, sensitive to ANY distributional difference, and the
   * classic pre-promotion gate "did the score distribution move?").
   * One row: `(n_a, n_b, ks)`. NULLs are excluded on both sides (a
   * completeness concern, not an ordering one — diff their counts via
   * [[categoricalDetail]]).
   *
   * Scale shape: one map-side-combined value count per side (corpus
   * touched exactly once each), a full-outer join on the value, then
   * ONE ordered window over the DOMAIN-sized joined frame for the two
   * running sums — the same single-partition domain reduce every drift
   * summary here ends in. The corpus itself never sorts.
   *
   * Determinism: counts are exact; each ECDF value is one exact
   * int/int double division; the gap rounds to 9 dp and `max` is
   * order-free; the published statistic rounds to 6 dp.
   */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("value"))
      .agg(count(lit(1)).as(n))
    val ca = counts(a, "n_a").withColumnRenamed("value", "va")
    val cb = counts(b, "n_b").withColumnRenamed("value", "vb")
    val w = org.apache.spark.sql.expressions.Window
    val all = w.partitionBy(lit(1))
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val cum = w.partitionBy(lit(1)).orderBy("value")
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    ca.join(cb, col("va") === col("vb"), "full_outer")
      .select(coalesce(col("va"), col("vb")).as("value"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("t_a", sum("n_a").over(all))
      .withColumn("t_b", sum("n_b").over(all))
      .withColumn("gap", round(abs(
        sum("n_a").over(cum).cast("double") / col("t_a").cast("double") -
        sum("n_b").over(cum).cast("double") / col("t_b").cast("double")), 9))
      .agg(max(col("t_a")).as("n_a"), max(col("t_b")).as("n_b"),
        round(max(col("gap")), 6).as("ks"))
  }

  /**
   * Per-day PSI timeline of a categorical (or pre-bucketed) column
   * against the corpus' first `baselineDays` days — [[psi]] turned
   * into the monitoring view: one row `(day, n_day, psi)` per active
   * day, so a mixture shift shows up as the DAY it happened instead of
   * one corpus-level number. Baseline days score too (their PSI is the
   * within-baseline wobble — a useful noise floor).
   *
   * Scale shape: the corpus reduces once to (day, value) cells;
   * everything after — baseline probabilities, the days × values
   * grid, the per-day DECIMAL sums — is domain-sized (|days|·|values|).
   * Same low-cardinality contract as [[psi]].
   *
   * Determinism: [[psi]]'s exact policy per cell — probabilities are
   * exact-count divisions rounded to 9 dp and floored at `epsilon`,
   * per-value terms snap to 9 dp and sum as DECIMAL, 6-dp publish.
   * NULL category values count as a real level (null-safe joins).
   */
  def psiTimeline(df: DataFrame, tsCol: String, valueCol: String,
                  baselineDays: Int = 7,
                  epsilon: Double = 1e-4): DataFrame = {
    require(baselineDays >= 1,
      s"baselineDays must be >= 1, got $baselineDays")
    require(epsilon > 0, "epsilon must be positive")
    import org.apache.spark.sql.expressions.Window
    val rows = df.where(col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(valueCol).as("value"))
    val d0 = rows.agg(min(col("day")).as("__d0"))
    val base = rows.crossJoin(broadcast(d0))
      .where(datediff(col("day"), col("__d0")) < baselineDays)
      .groupBy(col("value")).agg(count(lit(1)).as("__nb"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val baseP = base
      .withColumn("__tb", sum("__nb").over(all).cast("double"))
      .select(col("value").as("__bv"),
        (col("__nb") / col("__tb")).as("__pb"))
    val dayCounts = rows.groupBy(col("day"), col("value"))
      .agg(count(lit(1)).as("__nd"))
    val dayTotals = dayCounts.groupBy("day").agg(sum("__nd").as("__td"))
    val grid = dayTotals.crossJoin(rows.select(col("value")).distinct())
    val cells = grid
      .join(dayCounts.select(col("day").as("__dd"),
          col("value").as("__dv"), col("__nd")),
        col("day") === col("__dd") && col("value") <=> col("__dv"),
        "left")
      .join(broadcast(baseP), col("value") <=> col("__bv"), "left")
      .select(col("day"), col("__td"),
        coalesce(col("__nd"), lit(0L)).as("__nd"),
        coalesce(col("__pb"), lit(0.0)).as("__pb"))
    val pd = greatest(
      round(col("__nd").cast("double") / col("__td").cast("double"), 9),
      lit(epsilon))
    val pb = greatest(round(col("__pb"), 9), lit(epsilon))
    cells.withColumn("__w", round((pd - pb) * log(pd / pb), 9))
      .groupBy("day")
      .agg(max(col("__td")).as("n_day"),
        round(sum(col("__w").cast("decimal(20,9)")).cast("double"), 6)
          .as("psi"))
  }

  /**
   * PSI per TUMBLING WINDOW against a STATIC reference distribution —
   * the deployed drift-monitor shape ([[psiTimeline]] compares each day
   * to the corpus's own first week; this compares every `windowDays`
   * bucket to a fixed reference snapshot, the thing a production
   * monitor actually pins). Buckets are epoch-aligned k-day tumbles
   * (`1970-01-01 + i·k`), so bucket identity is a pure function of the
   * timestamp — no min-date pre-pass, and the STREAMING twin
   * ([[graft.streaming.StreamingPipeline.psiStream]], cross-checked
   * row-for-row) assigns buckets statelessly. One row per observed
   * window: `(window_start, n, psi)` over the value domain
   * window ∪ reference (a vanished level contributes its full
   * ε-floored term — that IS the signal). NULL values drop on both
   * sides (level-completeness drift belongs to [[categoricalDetail]]).
   *
   * Determinism: [[psi]]'s exact policy — 9-dp ε-floored shares, 9-dp
   * terms summed as DECIMAL, 6-dp publish. Scale shape: one
   * (window, value) map-side-combined reduce; everything after runs on
   * windows × domain cells.
   */
  def psiWindowed(df: DataFrame, tsCol: String, valueCol: String,
                  reference: DataFrame, windowDays: Int = 7,
                  epsilon: Double = 1e-4): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(epsilon > 0, "epsilon must be positive")
    val day = to_date(col(tsCol))
    val rows = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(date_sub(day,
          pmod(datediff(day, to_date(lit("1970-01-01"))),
            lit(windowDays)).cast("int")).as("window_start"),
        col(valueCol).cast("string").as("value"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val refP = reference.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("string").as("__bv"))
      .agg(count(lit(1)).as("__nb"))
      .withColumn("__tb", sum("__nb").over(all).cast("double"))
      .select(col("__bv"), (col("__nb") / col("__tb")).as("__pb"))
    val winCounts = rows.groupBy(col("window_start"), col("value"))
      .agg(count(lit(1)).as("__nw"))
    val winTotals = winCounts.groupBy("window_start")
      .agg(sum("__nw").as("__tw"))
    val domain = rows.select("value")
      .unionByName(refP.select(col("__bv").as("value"))).distinct()
    val cells = winTotals.crossJoin(domain)
      .join(winCounts.select(col("window_start").as("__ww"),
          col("value").as("__wv"), col("__nw")),
        col("window_start") === col("__ww") && col("value") === col("__wv"),
        "left")
      .join(broadcast(refP), col("value") === col("__bv"), "left")
      .select(col("window_start"), col("__tw"),
        coalesce(col("__nw"), lit(0L)).as("__nw"),
        coalesce(col("__pb"), lit(0.0)).as("__pb"))
    val pw = greatest(
      round(col("__nw").cast("double") / col("__tw").cast("double"), 9),
      lit(epsilon))
    val pb = greatest(round(col("__pb"), 9), lit(epsilon))
    cells.withColumn("__w", round((pw - pb) * log(pw / pb), 9))
      .groupBy("window_start")
      .agg(max(col("__tw")).as("n"),
        round(sum(col("__w").cast("decimal(20,9)")).cast("double"), 6)
          .as("psi"))
  }

  private def joined(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) =
      df.groupBy(col(valueCol).as("value")).agg(count(lit(1)).as(n))
    val ca = counts(a, "n_a").withColumnRenamed("value", "va")
    val cb = counts(b, "n_b").withColumnRenamed("value", "vb")
    // null-SAFE join key: a NULL category is a real level and must line
    // up across sides, not split into two half-rows. Corpus totals come
    // from the counts themselves (Σ n_a = |a|) via a window over the
    // DOMAIN-sized joined frame — a separate a.count()/b.count() would
    // re-scan each corpus a second time.
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ca.join(cb, col("va") <=> col("vb"), "full_outer")
      .select(coalesce(col("va"), col("vb")).as("value"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .withColumn("t_a", sum("n_a").over(all).cast("double"))
      .withColumn("t_b", sum("n_b").over(all).cast("double"))
      .withColumn("p_a", col("n_a") / col("t_a"))
      .withColumn("p_b", col("n_b") / col("t_b"))
  }
}
