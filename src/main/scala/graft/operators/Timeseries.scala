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

  /** 6-dp publish of an ALREADY-9-dp value via exact decimal rounding:
    * values that are exact 9-dp decimals (DECIMAL sums, integer±9-dp
    * arithmetic) land on a ...500 half-tie about 1/1000 of the time,
    * where Spark's string-BigDecimal round and a binary-double round
    * disagree — snapping through DECIMAL makes the half-up tie-break
    * arithmetic on BOTH engines. */
  private def pub6(c: Column): Column =
    round(c.cast(dec), 6).cast("double")

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
    // bounded-window: calendar-grid — one row per observed day
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
    // bounded-window: calendar-grid — one row per observed day
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
    // bounded-window: calendar-grid — one row per observed day
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
    // bounded-window: calendar-grid — one row per observed day
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
    // bounded-window: calendar-grid — one row per observed day
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
   * Brown's double exponential smoothing (Holt's linear trend with one
   * knob): S′ = EWMA(n), S″ = EWMA(S′), level = 2S′ − S″, trend =
   * α/(1−α)·(S′ − S″), one-step forecast = level + trend — the
   * cheapest trend-aware daily forecaster, and the natural upgrade
   * from [[ewma]] when the series actually drifts. Output one row per
   * day: `(day, n, smooth1, smooth2, level, trend, forecast)` where
   * `forecast` predicts day t+1 from day t's state.
   *
   * Scale shape: two grid×grid closed-form passes (see [[ewma]] — the
   * recursion is inexpressible, the closed form is a bounded
   * calendar-sized join, NEVER corpus-shaped); the corpus itself is
   * touched exactly once by the [[dailyCounts]] reduce.
   *
   * Determinism: both passes snap per-term products to 9 dp,
   * accumulate DECIMAL, re-snap each smoothed value to 9 dp before it
   * feeds the next pass; level/trend/forecast are fixed-shape 9-dp
   * arithmetic published at 6 dp.
   */
  def holt(df: DataFrame, tsCol: String, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val lnb = BigDecimal(math.log(1.0 - alpha))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ac = BigDecimal(alpha / (1.0 - alpha))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    // bounded-window: calendar-grid — one row per observed day
    val wOrd = Window.orderBy(col("day"))
    val base = dailyCounts(df, tsCol)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
    // one closed-form EWMA pass over (__rn, __x) -> (__rn, __s) at 9 dp
    def pass(src: DataFrame): DataFrame = {
      val t = src.select(col("__rn").as("__rt"))
      val i = src.select(col("__rn").as("__ri"), col("__x").as("__xi"))
      val k = d(col("__rt") - col("__ri"))
      val w = when(col("__rt") === col("__ri"), lit(1.0))
        .otherwise(round(exp(round(k * lit(lnb), 9)), 9))
      val term = when(col("__ri") === 1, round(w * col("__xi"), 9))
        .otherwise(round(lit(alpha) * w * col("__xi"), 9))
      t.join(i, col("__ri") <= col("__rt"))
        .withColumn("__term", term)
        .groupBy(col("__rt").as("__rn"))
        .agg(round(sum(col("__term").cast(dec)).cast("double"), 9).as("__s"))
    }
    val s1 = pass(base.select(col("__rn"), d(col("n")).as("__x")))
      .withColumnRenamed("__s", "__s1")
    val s2 = pass(s1.select(col("__rn"), col("__s1").as("__x")))
      .withColumnRenamed("__s", "__s2")
    val lvl = round(lit(2.0) * col("__s1") - col("__s2"), 9)
    val tr = round(lit(ac) * round(col("__s1") - col("__s2"), 9), 9)
    base.join(s1, "__rn").join(s2, "__rn")
      .select(col("day"), col("n"),
        pub6(col("__s1")).as("smooth1"),
        pub6(col("__s2")).as("smooth2"),
        pub6(lvl).as("level"),
        pub6(tr).as("trend"),
        pub6(round(lvl + tr, 9)).as("forecast"))
  }

  /**
   * Mann–Kendall trend test + Sen's slope over the daily counts: the
   * distribution-free "is this series actually trending?" — S counts
   * concordant-minus-discordant day pairs, z uses the tie-corrected
   * variance (continuity-corrected: S∓1), and Sen's slope is the
   * median of all pairwise slopes (n_j−n_i)/(j−i), robust where OLS
   * would chase one spike. One row: `(n_days, s, var_s, z, sen_slope)`;
   * `z` is NULL when the variance degenerates (constant series),
   * `sen_slope` NULL when fewer than 2 days.
   *
   * Scale shape: ONE corpus reduce to the calendar grid, then an
   * O(days²) pair join that is calendar-bounded (a decade ≈ 3.7k days
   * ≈ 6.7M pairs — trivial), with S and the tie table map-side
   * combined; the slope median runs on per-VALUE counts
   * ([[Profile.quantiles]]' compression).
   *
   * Determinism: S, N, and the tie term are exact integers; var_s is
   * one fixed division published at 6 dp; slopes snap to 9 dp before
   * counting; z follows the 9-dp/6-dp discipline.
   */
  def trendTest(df: DataFrame, tsCol: String): DataFrame = {
    // bounded-window: calendar-grid — one row per observed day
    val wOrd = Window.orderBy(col("day"))
    val base = dailyCounts(df, tsCol)
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
    val j = base.select(col("__rn").as("__rj"), col("n").as("__nj"))
    val i = base.select(col("__rn").as("__ri"), col("n").as("__ni"))
    val pairs = i.join(j, col("__ri") < col("__rj"))
    val sRow = pairs.agg(coalesce(
      sum(signum(d(col("__nj")) - d(col("__ni"))).cast("long")),
      lit(0L)).as("__S"))
    val nRow = base.agg(count(lit(1)).as("n_days"))
    val tieRow = base.groupBy(col("n")).agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1) *
        (lit(2L) * col("__t") + 5)), lit(0L)).as("__tt"))
    val slopes = pairs
      .select(round(d(col("__nj") - col("__ni")) /
        d(col("__rj") - col("__ri")), 9).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    // max-wrap: an empty median (< 2 days) must yield a NULL cell,
    // not an empty frame that a crossJoin would erase
    val senRow = discreteMedian(slopes, "__v", "__c")
      .agg(max(col("med")).as("__sen"))
    val nD = d(col("n_days"))
    val varS = round((nD * (nD - lit(1.0)) * (lit(2.0) * nD + lit(5.0)) -
      d(col("__tt"))) / lit(18.0), 9)
    val sD = d(col("__S"))
    val sg = round(sqrt(greatest(varS, lit(0.0))), 9)
    val zRaw = when(sD > 0.0, round(sdiv(sD - lit(1.0), sg), 6))
      .when(sD < 0.0, round(sdiv(sD + lit(1.0), sg), 6))
      .otherwise(lit(0.0))
    nRow.crossJoin(broadcast(sRow)).crossJoin(broadcast(tieRow))
      .crossJoin(broadcast(senRow))
      .select(col("n_days"), col("__S").as("s"),
        pub6(varS).as("var_s"),
        when(sg === 0.0, lit(null).cast("double"))
          .otherwise(zRaw).as("z"),
        col("__sen").as("sen_slope"))
  }

  /** Discrete median of a (value, count) table: the value at rank
    * ⌈round(0.5·N, 9)⌉ — [[Profile.quantiles]]' convention (an actual
    * data value, no interpolation). Returns a 1-row frame `(med)`. */
  private def discreteMedian(cells: DataFrame, valueCol: String,
                             cntCol: String): DataFrame = {
    // bounded-window: integer-cells — callers feed integer daily counts or 9-dp day-pair slopes (calendar-derived)
    val wCum = Window.orderBy(col(valueCol).asc)
    val wAll = Window.partitionBy()
    cells
      .withColumn("__cum", sum(col(cntCol)).over(wCum))
      .withColumn("__nn", sum(col(cntCol)).over(wAll))
      .withColumn("__r",
        ceil(round(lit(0.5) * col("__nn").cast("double"), 9)).cast("long"))
      .where(col("__cum") - col(cntCol) < col("__r") &&
        col("__r") <= col("__cum"))
      .select(col(valueCol).cast("double").as("med"))
  }

  /**
   * Robust (median/MAD) daily-volume anomalies: z = 0.6745·(n − med) /
   * MAD, flagged at |z| > `zThreshold` (3.5 is the Iglewicz–Hoaglin
   * convention) — unlike [[weekdayAnomaly]]'s mean/σ residuals, a few
   * giant spikes cannot drag the baseline toward themselves, so
   * repeated outliers still flag. Output `(day, n, median, mad, z,
   * anomaly)`; z is NULL when MAD = 0 (a majority-constant series).
   *
   * Both medians run on per-VALUE counts of the calendar-bounded grid
   * ([[Profile.quantiles]]' compression), so the ordered windows see
   * distinct counts, never days, never the corpus.
   */
  def robustAnomaly(df: DataFrame, tsCol: String,
                    zThreshold: Double = 3.5): DataFrame = {
    val grid = dailyCounts(df, tsCol)
    val med = discreteMedian(
      grid.groupBy(col("n").cast("double").as("__v"))
        .agg(count(lit(1)).as("__c")), "__v", "__c")
    val withMed = grid.crossJoin(broadcast(med))
      .withColumn("__adev", round(abs(d(col("n")) - col("med")), 9))
    val mad = discreteMedian(
      withMed.groupBy(col("__adev").as("__v"))
        .agg(count(lit(1)).as("__c")), "__v", "__c")
      .select(col("med").as("madv"))
    // z is tie-prone at the 6-dp publish (MAD is typically a small
    // integer, so 0.6745·diff/MAD often lands exactly on a ...5): snap
    // to 9 dp, then round as an EXACT decimal so the half-up tie-break
    // is arithmetic, not double-representation luck.
    withMed.crossJoin(broadcast(mad))
      .withColumn("__z",
        when(col("madv") > 0.0,
          round(round(lit(0.6745) * round(d(col("n")) - col("med"), 9) /
              col("madv"), 9).cast("decimal(28,9)"), 6).cast("double")))
      .select(col("day"), col("n"), col("med").as("median"),
        col("madv").as("mad"), col("__z").as("z"),
        coalesce(abs(col("__z")) > zThreshold, lit(false)).as("anomaly"))
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
    // bounded-window: calendar-grid — one row per observed day
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

  /**
   * Daily OHLC resample of a value stream — the standard downsample
   * for any metric-over-time view: per day `(day, n, open, high, low,
   * close)` where open/close are the values of the first/last row by
   * `(ts, id)` and high/low the exact extremes. `idCol` totally orders
   * same-timestamp rows (the [[graft.operators.Funnel.transitions]]
   * tie discipline), so every cell is a pure function of the data.
   * NULL values drop; days with no surviving rows are absent (OHLC of
   * nothing is undefined — join against [[dailyCounts]] for a gapless
   * calendar).
   *
   * Scale shape: one day-keyed shuffle; open/close ride two
   * row_number windows over that same partitioning (no global sort),
   * high/low/n map-side combine. Published values round to 6 dp.
   */
  def ohlc(df: DataFrame, tsCol: String, valueCol: String,
           idCol: String): DataFrame = {
    val rows = df
      .where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(valueCol).cast("double").as("__v"))
    val wAsc = Window.partitionBy(col("day"))
      .orderBy(col("__ts").asc, col("__id").asc)
    val wDesc = Window.partitionBy(col("day"))
      .orderBy(col("__ts").desc, col("__id").desc)
    rows
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"),
        round(max(when(col("__ra") === 1, col("__v"))), 6).as("open"),
        round(max(col("__v")), 6).as("high"),
        round(min(col("__v")), 6).as("low"),
        round(max(when(col("__rd") === 1, col("__v"))), 6).as("close"))
  }

  /**
   * Period-over-period growth per key — the "movers" report
   * (week-over-week gainers and losers by event type / source /
   * product): per (key, period) the activity count, the IMMEDIATELY
   * previous period's count (NULL across gaps — a key silent last
   * period has no defined growth, the [[graft.operators.Cohort.churn]]
   * absence-of-evidence stance), and `growth = (n − prev)/prev` at
   * 6 dp. Periods anchor at the corpus' first day.
   *
   * Scale shape: one corpus reduce to (key, period) cells, then a
   * key-partitioned lag window over the bounded cell table. Growth is
   * one exact int/int double division.
   */
  def periodGrowth(df: DataFrame, tsCol: String, keyCol: String,
                   periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val rows = df
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("__day"))
    val d0 = rows.agg(min(col("__day")).as("__d0"))
    val cells = rows.crossJoin(broadcast(d0))
      .select(col("key"),
        floor(datediff(col("__day"), col("__d0")) / periodDays)
          .cast("long").as("__p"),
        col("__d0"))
      .groupBy(col("key"), col("__p"), col("__d0"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("__p"))
    cells
      .withColumn("__prevp", lag(col("__p"), 1).over(w))
      .withColumn("__prevn", lag(col("n"), 1).over(w))
      .select(col("key"),
        date_add(col("__d0"), (col("__p") * periodDays).cast("int"))
          .as("period"),
        col("n"),
        when(col("__prevp") === col("__p") - 1, col("__prevn"))
          .as("prev_n"),
        when(col("__prevp") === col("__p") - 1,
          round((col("n") - col("__prevn")).cast("double") /
            col("__prevn").cast("double"), 6)).as("growth"))
  }

  /**
   * Exponentially-decayed activity counts per key — the "trending"
   * leaderboard: each event contributes `2^(−age_days/halfLife)`
   * relative to the corpus' last day, so a key active yesterday
   * outranks one equally active last month. Output `(key, n_events,
   * score)`; score is the decayed mass at 6 dp, `n_events` the raw
   * count for context.
   *
   * Scale shape: the corpus reduces ONCE to (key, day) cells; decay
   * weights and the final rollup run on that bounded grid (keys ×
   * active days), so corpus growth only widens the map-side combine.
   *
   * Determinism: age is an exact integer day diff; the weight goes
   * through the [[ewma]] ln/exp discipline (ln 2 snapped to 9 dp
   * driver-side, exponent and weight each snapped to 9 dp, per-cell
   * products DECIMAL-summed).
   */
  def decayedCounts(df: DataFrame, tsCol: String, keyCol: String,
                    halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1,
      s"halfLifeDays must be >= 1, got $halfLifeDays")
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val days = df
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("key"), to_date(col(tsCol)).as("__day"))
    val mx = days.agg(max(col("__day")).as("__mx"))
    days.groupBy(col("key"), col("__day")).agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(mx))
      .withColumn("__w", round(exp(round(
        lit(-ln2) * datediff(col("__mx"), col("__day")) /
          lit(halfLifeDays.toDouble), 9)), 9))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n_events"),
        round(sum(round(col("__w") * col("__n"), 9).cast(dec)), 6)
          .cast("double").as("score"))
  }

  /**
   * MASE (mean absolute scaled error) backtest: the seasonal-naive
   * forecast's MAE divided by the one-step-naive's MAE on the SAME
   * evaluation rows — the scale-free "is this forecast better than
   * 'same as yesterday'?" (Hyndman & Koehler 2006); < 1 beats naïve-1.
   * One row: `(n_eval, mae_forecast, mae_naive, mase)`; rows need both
   * the `season`-lag and the 1-lag, and `mase` is NULL when the naive
   * MAE is 0 (a constant series scales nothing).
   *
   * Same corpus-reduce-then-tiny-grid shape as
   * [[seasonalNaiveBacktest]]; integer errors, so only the final
   * divisions round.
   */
  /**
   * Last-observation-carried-forward resample onto a dense daily grid —
   * the feature-engineering join shape for sparse per-key signals
   * (price, config, score): each key's grid runs from ITS first
   * observation to the GLOBAL last day, with the day's value = the
   * latest observation that day (ties on ts break to the larger value —
   * a total struct-max, no window over raw events) and gap days
   * forward-filled from the last observed day. Output one row per
   * (key, day): `(key, day, value, observed)` with `observed` false on
   * filled days. Days before a key's first observation do not exist
   * (nothing to carry); NULL keys/ts/values drop.
   *
   * Scale shape: one (key, day) struct-max reduce (map-side combined —
   * events collapse before the shuffle), one |keys|-row span aggregate
   * joined to the calendar explode, then ONE key-partitioned
   * forward-fill window over the GRID (keys × days — calendar-bounded,
   * not event-bounded). Same discipline as [[dailyCounts]].
   */
  def locf(df: DataFrame, tsCol: String, keyCol: String,
           valueCol: String): DataFrame = {
    val obs = df
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        to_date(col(tsCol)).as("day"),
        col(tsCol).cast("timestamp").as("__ts"),
        col(valueCol).cast("double").as("__v"))
      .groupBy("key", "day")
      .agg(max(struct(col("__ts"), col("__v"))).as("__m"))
      .select(col("key"), col("day"), col("__m")("__v").as("__obs"))
    val spans = obs.groupBy("key").agg(min(col("day")).as("__d0"))
    val maxDay = obs.agg(max(col("day")).as("__d1"))
    val grid = spans.crossJoin(broadcast(maxDay))
      .select(col("key"),
        explode(sequence(col("__d0"), col("__d1"))).as("day"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "day"), "left")
      .select(col("key"), col("day"),
        last(col("__obs"), ignoreNulls = true).over(wFill).as("value"),
        col("__obs").isNotNull.as("observed"))
  }

  /**
   * Trailing-window Pearson correlation of two signals on the daily
   * grid — the co-movement diagnostic (metric vs spend, quality vs
   * volume) that a single global correlation hides: per day, the
   * correlation of the two daily MEANS over the trailing `window` days.
   * Output `(day, x_mean, y_mean, corr)`; `corr` NULL until the window
   * is full and on zero variance. Days with no observations carry NULL
   * means and break the window (they count toward the span but
   * contribute nothing — the honest gap treatment; zero-filling would
   * fabricate correlation).
   *
   * Scale shape: ONE map-side-combined daily reduce (events collapse to
   * the calendar grid), then fixed-width rolling moment sums over the
   * GRID — corpus rows never enter a window. Determinism: daily means
   * round to 9 dp; rolling moments sum 9-dp products as DECIMAL; the
   * final correlation is one fixed-order double chain published at 6 dp.
   */
  def rollingCorrelation(df: DataFrame, tsCol: String, xCol: String,
                         yCol: String, window: Int = 7): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val daily = df
      .where(col(tsCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col(xCol).cast("double"), 9).cast(dec)).as("__sx"),
        sum(round(col(yCol).cast("double"), 9).cast(dec)).as("__sy"))
      .select(col("day"),
        round(d(col("__sx")) / d(col("__n")), 9).as("__mx"),
        round(d(col("__sy")) / d(col("__n")), 9).as("__my"))
    val grid = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
      .join(daily, Seq("day"), "left")
    // bounded-window: calendar-grid — one row per grid day
    val w = Window.orderBy(col("day")).rowsBetween(-(window - 1), 0)
    val k = count(col("__mx")).over(w)
    def roll(c: Column) = d(sum(c.cast(dec)).over(w))
    val n = d(k)
    val sx = roll(col("__mx"))
    val sy = roll(col("__my"))
    val sxx = roll(round(col("__mx") * col("__mx"), 9))
    val syy = roll(round(col("__my") * col("__my"), 9))
    val sxy = roll(round(col("__mx") * col("__my"), 9))
    val covn = round(sxy - round(sx * sy / n, 9), 9)
    val vxn = round(sxx - round(sx * sx / n, 9), 9)
    val vyn = round(syy - round(sy * sy / n, 9), 9)
    grid
      .withColumn("__k", k)
      .withColumn("corr",
        when(col("__k") < window || vxn <= 0.0 || vyn <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(covn / round(sqrt(vxn) * sqrt(vyn), 9), 6)))
      .select(col("day"),
        round(col("__mx"), 6).as("x_mean"),
        round(col("__my"), 6).as("y_mean"), col("corr"))
  }

  /**
   * [[rollingCorrelation]] re-keyed by WINDOW-END day — the
   * stream-legal shape (and the one
   * [[graft.streaming.StreamingPipeline.rollingCorrelationStream]]'s
   * state replays): each daily mean-cell replicates to the `window`
   * end-days it participates in, and every end-day reduces its ≤window
   * cells independently — no window function at all, so end-days
   * parallelize freely instead of sharing one calendar-ordered frame.
   *
   * Contract difference vs the grid variant (deliberate, stream-
   * matching): one row per OBSERVED day only — the dense grid's
   * NULL-mean rows for unobserved days don't exist here, because a
   * stream cannot know the global span. On observed days the digits
   * are identical: same 9-dp daily means, same exact DECIMAL moment
   * sums over the same present cells, same fixed-order correlation
   * chain at 6 dp (k counts present days, so gaps break the window
   * exactly as in the grid variant).
   */
  def rollingCorrelationEndKeyed(df: DataFrame, tsCol: String, xCol: String,
                                 yCol: String, window: Int = 7): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val daily = df
      .where(col(tsCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__n"),
        sum(round(col(xCol).cast("double"), 9).cast(dec)).as("__sx"),
        sum(round(col(yCol).cast("double"), 9).cast(dec)).as("__sy"))
      .select(col("day"),
        round(d(col("__sx")) / d(col("__n")), 9).as("__mx"),
        round(d(col("__sy")) / d(col("__n")), 9).as("__my"))
    // |grid|×window cell replication — bounded by the calendar, never
    // by the corpus (the corpus already reduced to daily cells above)
    val keyed = daily
      .select(col("day"), col("__mx"), col("__my"),
        explode(sequence(lit(0), lit(window - 1))).as("__off"))
      .withColumn("__end", date_add(col("day"), col("__off")))
    val agg = keyed.groupBy(col("__end").as("day")).agg(
      count(lit(1)).as("__k"),
      sum(col("__mx").cast(dec)).as("__rsx"),
      sum(col("__my").cast(dec)).as("__rsy"),
      sum(round(col("__mx") * col("__mx"), 9).cast(dec)).as("__rsxx"),
      sum(round(col("__my") * col("__my"), 9).cast(dec)).as("__rsyy"),
      sum(round(col("__mx") * col("__my"), 9).cast(dec)).as("__rsxy"),
      max(when(col("__off") === 0, col("__mx"))).as("__mxe"),
      max(when(col("__off") === 0, col("__my"))).as("__mye"),
      max(when(col("__off") === 0, lit(1)).otherwise(lit(0))).as("__obs"))
    val n = d(col("__k"))
    val sx = d(col("__rsx")); val sy = d(col("__rsy"))
    val sxx = d(col("__rsxx")); val syy = d(col("__rsyy"))
    val sxy = d(col("__rsxy"))
    val covn = round(sxy - round(sx * sy / n, 9), 9)
    val vxn = round(sxx - round(sx * sx / n, 9), 9)
    val vyn = round(syy - round(sy * sy / n, 9), 9)
    agg.where(col("__obs") === 1)
      .select(col("day"),
        round(col("__mxe"), 6).as("x_mean"),
        round(col("__mye"), 6).as("y_mean"),
        when(col("__k") < window || vxn <= 0.0 || vyn <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(covn / round(sqrt(vxn) * sqrt(vyn), 9), 6))
          .as("corr"))
  }

  def maseBacktest(df: DataFrame, tsCol: String,
                   season: Int = 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    // bounded-window: calendar-grid — one row per observed day
    val wOrd = Window.orderBy(col("day"))
    val scored = dailyCounts(df, tsCol)
      .withColumn("__f", lag(col("n"), season).over(wOrd))
      .withColumn("__l1", lag(col("n"), 1).over(wOrd))
      .where(col("__f").isNotNull && col("__l1").isNotNull)
    val m = scored.agg(
      count(lit(1)).as("n_eval"),
      sum(abs(col("n") - col("__f"))).as("__sf"),
      sum(abs(col("n") - col("__l1"))).as("__sn"))
    val maef = round(sdiv(d(col("__sf")), d(col("n_eval"))), 9)
    val maen = round(sdiv(d(col("__sn")), d(col("n_eval"))), 9)
    m.select(col("n_eval"),
      when(col("n_eval") === 0, lit(null).cast("double"))
        .otherwise(round(maef, 6)).as("mae_forecast"),
      when(col("n_eval") === 0, lit(null).cast("double"))
        .otherwise(round(maen, 6)).as("mae_naive"),
      when(col("n_eval") === 0 || maen === 0.0, lit(null).cast("double"))
        .otherwise(round(sdiv(maef, maen), 6)).as("mase"))
  }
}
