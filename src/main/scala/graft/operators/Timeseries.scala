package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Daily time-series decomposition + anomaly flags over an event
 * stream — STL-lite: centered-moving-average trend, day-of-week
 * seasonal offsets, and z-scored residuals ("did Tuesday spike beyond
 * its usual Tuesday-ness?"). The operational monitor for ingestion
 * volumes and event pipelines.
 *
 * Scale shape: ONE map-side-combined corpus pass reduces events to the
 * per-day count grid; the grid is bounded by the calendar span (years ≈
 * thousands of rows, NEVER corpus-sized), so every window/join after
 * the reduce — including the deliberately unpartitioned ordered
 * window — runs on a few KB regardless of input scale. Zero-filled
 * missing days keep the centered window honest across gaps.
 *
 * Determinism: counts are exact; trend/seasonal/residual snap to 9 dp
 * at every step, cross-row accumulations are DECIMAL sums, weekday is
 * pure date arithmetic (days since Monday 1970-01-05, mod 7 — no
 * engine-specific DOW convention), and published values round to 6 dp.
 */
object Timeseries {

  private def d(c: Column): Column = c.cast("double")
  private val dec = "decimal(28,9)"

  /** Complete zero-filled daily counts `(day, n)` spanning
    * [min-day, max-day] of `tsCol` (NULL timestamps drop). */
  def dailyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df
      .where(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__n"))
    counts.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("__n"), lit(0L)).as("n"))
  }

  /**
   * Decompose daily counts and flag anomalies. Output one row per day:
   * `(day, n, trend, seasonal, z, anomaly)` where `trend` is the
   * (2·halfWindow+1)-day centered moving average (NULL at the edges
   * where the window is incomplete), `seasonal` the mean detrended
   * deviation of that weekday, `z` the residual in global residual
   * standard deviations (NULL where trend is NULL or the residuals are
   * degenerate), and `anomaly` = |z| > zThreshold.
   */
  def weekdayAnomaly(df: DataFrame, tsCol: String, halfWindow: Int = 3,
                     zThreshold: Double = 3.0): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val span = 2 * halfWindow + 1
    val wC = Window.orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    val wAll = Window.partitionBy()
    val grid = dailyCounts(df, tsCol)
      .withColumn("__wd",
        pmod(datediff(col("day"), to_date(lit("1970-01-05"))), lit(7)))
      .withColumn("__trend",
        when(count(lit(1)).over(wC) === span,
          round(d(sum(col("n")).over(wC)) / lit(span.toDouble), 9)))
      .withColumn("__dev", round(d(col("n")) - col("__trend"), 9))
    val wWd = Window.partitionBy(col("__wd"))
    val seasoned = grid
      .withColumn("__seasonal",
        round(d(sum(col("__dev").cast(dec)).over(wWd)) /
          d(count(col("__dev")).over(wWd)), 9))
      .withColumn("__resid",
        round(d(col("n")) - col("__trend") - col("__seasonal"), 9))
    val scored = seasoned
      .withColumn("__rmean",
        round(d(sum(col("__resid").cast(dec)).over(wAll)) /
          d(count(col("__resid")).over(wAll)), 9))
      .withColumn("__rsq",
        round(d(sum(round(col("__resid") * col("__resid"), 9).cast(dec))
          .over(wAll)) / d(count(col("__resid")).over(wAll)), 9))
      .withColumn("__sigma",
        round(sqrt(greatest(
          round(col("__rsq") - col("__rmean") * col("__rmean"), 9),
          lit(0.0))), 9))
      .withColumn("__z",
        when(col("__sigma") > 0.0,
          round(col("__resid") / col("__sigma"), 6)))
    scored.select(col("day"), col("n"),
      round(col("__trend"), 6).as("trend"),
      round(col("__seasonal"), 6).as("seasonal"),
      col("__z").as("z"),
      coalesce(abs(col("__z")) > zThreshold, lit(false)).as("anomaly"))
  }

  /** Grid + 1-based day index + 9-dp global mean + 9-dp deviations —
    * the shared front half of the second-moment diagnostics below.
    * Runs entirely on the calendar-bounded grid. */
  private def devGrid(df: DataFrame, tsCol: String): DataFrame = {
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col("day"))
    dailyCounts(df, tsCol)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__mean",
        round(d(sum(col("n").cast(dec)).over(wAll)) /
          d(count(lit(1)).over(wAll)), 9))
      .withColumn("__dev", round(d(col("n")) - col("__mean"), 9))
  }

  /**
   * Sample autocorrelation of the daily-count series at lags
   * 1..`maxLag`: r(h) = Σ_{t>h} devₜ·devₜ₋ₕ / Σ devₜ² over the
   * zero-filled grid — the seasonality detector (a weekly cycle shows
   * as a spike at lag 7). Output `(lag, n_pairs, acf)`; `acf` is NULL
   * when the series is constant (zero variance) or the lag exceeds the
   * span. Per-term products snap to 9 dp, sums accumulate as DECIMAL,
   * publish at 6 dp.
   *
   * Scale shape: the lag join runs on the aggregated grid (calendar ×
   * maxLag rows), never the corpus; the corpus contributes exactly the
   * one [[dailyCounts]] reduce.
   */
  def acf(df: DataFrame, tsCol: String, maxLag: Int = 14): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366,
      s"maxLag must be in [1, 366], got $maxLag")
    val base = devGrid(df, tsCol)
    val denom = base
      .agg(sum(round(col("__dev") * col("__dev"), 9).cast(dec))
        .cast("double").as("__denom"))
    val lags = df.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val a = base.select(col("__rn").as("__r1"), col("__dev").as("__d1"))
    val b = base.select(col("__rn").as("__r2"), col("__dev").as("__d2"))
    val nums = a.join(broadcast(lags), col("__r1") > col("lag"))
      .join(b, col("__r2") === col("__r1") - col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(round(col("__d1") * col("__d2"), 9).cast(dec))
          .cast("double").as("__num"))
    lags.join(nums, Seq("lag"), "left").crossJoin(denom)
      .select(col("lag"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("__denom") > 0.0 && col("__num").isNotNull,
          round(col("__num") / col("__denom"), 6)).as("acf"))
  }

  /**
   * CUSUM of mean deviations: Sₜ = Σ_{i≤t}(nᵢ − n̄) per day — the
   * level-shift detector (a sustained volume change bends the curve
   * into a V at the change day). Output `(day, n, cusum)`.
   */
  def cusum(df: DataFrame, tsCol: String): DataFrame = {
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    devGrid(df, tsCol)
      .withColumn("__s", sum(col("__dev").cast(dec)).over(wCum))
      .select(col("day"), col("n"),
        round(col("__s").cast("double"), 6).as("cusum"))
  }

  /**
   * Single most-likely level change: the day maximizing |CUSUM|
   * (earliest on ties) plus the normalized statistic
   * max|Sₜ| / (σ·√T) — the classic CUSUM test scale (≳1.36 ≈ 5%
   * Kolmogorov critical value under no change). One row:
   * `(change_day, cusum_abs, stat)`; `stat` is NULL for a constant
   * series (σ = 0).
   */
  def changepoint(df: DataFrame, tsCol: String): DataFrame = {
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val scored = devGrid(df, tsCol)
      .withColumn("__s9",
        round(sum(col("__dev").cast(dec)).over(wCum).cast("double"), 9))
      .withColumn("__abs", abs(col("__s9")))
      .withColumn("__rsq",
        round(d(sum(round(d(col("n")) * d(col("n")), 9).cast(dec))
          .over(wAll)) / d(count(lit(1)).over(wAll)), 9))
      .withColumn("__sigma",
        round(sqrt(greatest(
          round(col("__rsq") - col("__mean") * col("__mean"), 9),
          lit(0.0))), 9))
      .withColumn("__t", count(lit(1)).over(wAll))
    val top = scored
      .withColumn("__mx", max(col("__abs")).over(wAll))
      .where(col("__abs") === col("__mx"))
      .agg(min(col("day")).as("change_day"), max(col("__abs")).as("__a"),
        max(col("__sigma")).as("__sg"), max(col("__t")).as("__tt"))
    top.select(col("change_day"), round(col("__a"), 6).as("cusum_abs"),
      when(col("__sg") > 0.0,
        round(sdiv(col("__a"),
          round(col("__sg") * round(sqrt(d(col("__tt"))), 9), 9)), 6))
        .as("stat"))
  }

  /** Total division (see [[Experiment]]). */
  private def sdiv(a: Column, b: Column): Column =
    a / when(b === 0.0, lit(1.0)).otherwise(b)

  /**
   * Exponentially-weighted moving average of the daily counts,
   * sₜ = α·nₜ + (1−α)·sₜ₋₁ (s₁ = n₁), computed in CLOSED form —
   * sₜ = (1−α)^(t−1)·n₁ + α·Σ_{i=2..t}(1−α)^(t−i)·nᵢ — so the engine
   * pays one grid×grid join (calendar-bounded, so O(days²) is
   * thousands-squared at most, never corpus-shaped) instead of an
   * inexpressible sequential recursion. Output `(day, n, ewma)`.
   *
   * Determinism: decay powers go through the ln/exp 9-dp discipline
   * ((1−α)^k = exp(k·ln(1−α)) with ln, the product, and exp each
   * snapped to 9 dp), per-term products snap to 9 dp, the per-day sum
   * accumulates as DECIMAL, publish at 6 dp — bit-exact against the
   * DuckDB mirror of the same closed form.
   */
  def ewma(df: DataFrame, tsCol: String, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val lnb = BigDecimal(math.log(1.0 - alpha))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wOrd = Window.orderBy(col("day"))
    val base = dailyCounts(df, tsCol)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
    val t = base.select(col("day"), col("n"), col("__rn").as("__rt"))
    val i = base.select(col("__rn").as("__ri"), col("n").as("__xi"))
    val k = d(col("__rt") - col("__ri"))
    val w = when(col("__rt") === col("__ri"), lit(1.0))
      .otherwise(round(exp(round(k * lit(lnb), 9)), 9))
    val term = when(col("__ri") === 1, round(w * d(col("__xi")), 9))
      .otherwise(round(lit(alpha) * w * d(col("__xi")), 9))
    t.join(i, col("__ri") <= col("__rt"))
      .withColumn("__term", term)
      .groupBy(col("day"), col("n"))
      .agg(round(sum(col("__term").cast(dec)).cast("double"), 6).as("ewma"))
  }

  /**
   * Seasonal-naive forecast backtest: predict each day as the count
   * `season` days earlier (the "same day last week" baseline every
   * real forecaster must beat) and score the fit over the grid. One
   * row: `(n_days, mae, rmse, smape)`; sMAPE terms with both actual
   * and forecast zero contribute 0 (the 0/0 convention). NULL-safe:
   * the first `season` days have no forecast and are excluded.
   */
  def seasonalNaiveBacktest(df: DataFrame, tsCol: String,
                            season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    val wOrd = Window.orderBy(col("day"))
    val scored = dailyCounts(df, tsCol)
      .withColumn("__f", lag(col("n"), season).over(wOrd))
      .where(col("__f").isNotNull)
      .withColumn("__err", round(d(col("n")) - d(col("__f")), 9))
      .withColumn("__sm",
        when(col("n") === 0 && col("__f") === 0, lit(0.0))
          .otherwise(round(sdiv(lit(2.0) * abs(col("__err")),
            d(col("n")) + d(col("__f"))), 9)))
    scored.agg(
      count(lit(1)).as("n_days"),
      round(d(sum(round(abs(col("__err")), 9).cast(dec))) /
        d(count(lit(1))), 6).as("mae"),
      round(sqrt(round(
        d(sum(round(col("__err") * col("__err"), 9).cast(dec))) /
          d(count(lit(1))), 9)), 6).as("rmse"),
      round(d(sum(col("__sm").cast(dec))) / d(count(lit(1))), 6)
        .as("smape"))
  }
}
