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
}
