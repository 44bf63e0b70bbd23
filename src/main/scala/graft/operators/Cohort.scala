package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention over an event log: users grouped by the period of
 * their FIRST event (the cohort), counted in each later period they
 * returned — the classic retention triangle. Pure integer/date
 * arithmetic end to end (period truncation, day diffs, distinct counts),
 * so results are bit-stable across engines and partitionings.
 *
 * Scale shape: first-seen is one map-side-combined min aggregation; the
 * event stream then joins back on the user key (the cohort table is
 * |users|-sized — AQE broadcasts it when it fits); (user, cohort,
 * offset) dedups BEFORE the final count so a chatty user costs one row
 * per active period, not one per event. No windows over the full log.
 */
object Cohort {

  /**
   * Retention counts `(cohort, period_offset, n_users)` — `cohort` is the
   * DATE of the user's first-event period start, `period_offset` how many
   * periods after it the user was active. `period` is `"week"` (Monday
   * start, both engines' convention) or `"day"`. Row (c, 0) counts the
   * cohort's size; offsets are dense only where activity exists (readers
   * zero-fill, the scan doesn't).
   */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                period: String = "week"): DataFrame = {
    val days = period match {
      case "week" => 7
      case "day"  => 1
      case other  => throw new IllegalArgumentException(
        s"period must be 'week' or 'day', got '$other'")
    }
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"))
    val first = ev.groupBy("u").agg(min("ts").as("first_ts"))
    val active = ev.join(first, "u")
      .select(col("u"),
        to_date(date_trunc(period, col("first_ts"))).as("cohort"),
        // both dates are period-truncated, so the day diff divides exactly
        (datediff(to_date(date_trunc(period, col("ts"))),
          to_date(date_trunc(period, col("first_ts")))) / days)
          .cast("long").as("period_offset"))
      .distinct()
    active.groupBy("cohort", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * [[retention]] normalized by cohort size: `(cohort, period_offset,
   * n_users, rate)` with `rate = n_users / cohort_size` rounded to 6 dp —
   * offset 0 is 1.0 by construction. The size join is cohort-count-sized
   * (a window over the triangle, not a corpus re-scan).
   */
  def retentionRate(events: DataFrame, userCol: String, tsCol: String,
                    period: String = "week"): DataFrame = {
    val tri = retention(events, userCol, tsCol, period)
    val size = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    tri.withColumn("__size",
        max(when(col("period_offset") === 0, col("n_users"))).over(size))
      .withColumn("rate",
        round(col("n_users") / col("__size").cast("double"), 6))
      .drop("__size")
  }
}
