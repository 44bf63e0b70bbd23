package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /**
   * Daily engagement: `(day, dau, wau, mau, stickiness)` over the
   * zero-filled calendar — DAU = distinct users that day, WAU/MAU =
   * distinct users in the trailing 7/28 days (inclusive), stickiness =
   * dau/mau at 6 dp ("of everyone monthly-active, what share showed up
   * today?"), NULL on an all-idle trailing month. The product-health
   * dashboard's first row.
   *
   * Scale shape: the corpus reduces ONCE to distinct (user, day) pairs
   * (map-side combined); each pair then EXPLODES into the ≤7/≤28
   * trailing days it contributes to, and `count(distinct user)` per day
   * dedups map-side again — all shuffles carry (user, day)-sized keys,
   * linear in |pairs|, never a per-day set intersection or a
   * range-window over the log. Days beyond the observed max are
   * clipped so a last-day user doesn't invent future rows.
   */
  def engagement(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val pairs = events
      .where(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val bounds = pairs.agg(min(col("day")).as("__d0"),
      max(col("day")).as("__d1"))
    val grid = bounds
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
    def trailing(n: Int, out: String) = pairs
      .crossJoin(broadcast(bounds))
      .select(col("u"), explode(sequence(col("day"),
        least(date_add(col("day"), n - 1), col("__d1")))).as("day"))
      .groupBy("day").agg(countDistinct(col("u")).as(out))
    val dau = pairs.groupBy("day").agg(countDistinct(col("u")).as("dau"))
    grid
      .join(dau, Seq("day"), "left")
      .join(trailing(7, "wau"), Seq("day"), "left")
      .join(trailing(28, "mau"), Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"),
        when(coalesce(col("mau"), lit(0L)) === 0,
          lit(null).cast("double"))
          .otherwise(round(coalesce(col("dau"), lit(0L)).cast("double") /
            col("mau").cast("double"), 6)).as("stickiness"))
  }

  /**
   * Period-over-period churn: users active in period p split by whether
   * they returned in p+1. Output `(period, n_active, n_new, n_retained,
   * n_churned, churn_rate)` — `period` is the p-th `periodDays`-day
   * bucket's start date (anchored at the corpus' first day), `n_new`
   * counts first-ever-seen users, `n_churned = n_active − n_retained`,
   * rate at 6 dp; the LAST period's retained/churned are NULL (its
   * successor is unobserved), not zero — absence of evidence.
   *
   * Scale shape: one reduce to distinct (user, period) pairs, one
   * self-join shifted by +1 period on (user, period) — equi-join on
   * composite key, broadcast-eligible per AQE — and a first-seen min
   * per user (map-side combined). Everything after the reduce is
   * |user-period|-sized.
   */
  def churn(events: DataFrame, userCol: String, tsCol: String,
            periodDays: Int = 7): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1, got $periodDays")
    val raw = events
      .where(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("__day"))
    val d0 = raw.agg(min(col("__day")).as("__d0"))
    val up = raw.crossJoin(broadcast(d0))
      // explicit floor: a bare double->long cast truncates in Spark but
      // ROUNDS in several SQL engines — floor is unambiguous in both
      .select(col("u"),
        floor(datediff(col("__day"), col("__d0")) / periodDays)
          .cast("long").as("__p"),
        col("__d0"))
      .distinct()
    val firstP = up.groupBy(col("u")).agg(min(col("__p")).as("__fp"))
    val next = up.select(col("u").as("__un"), (col("__p") - 1).as("__pn"))
      .distinct()
    val maxP = up.agg(max(col("__p")).as("__mp"))
    up.join(firstP, "u")
      .join(next, col("u") === col("__un") && col("__p") === col("__pn"),
        "left")
      .groupBy(col("__p"), col("__d0"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("__fp") === col("__p"), lit(1))).as("n_new"),
        count(col("__un")).as("__ret"))
      .crossJoin(broadcast(maxP))
      .select(date_add(col("__d0"),
          (col("__p") * periodDays).cast("int")).as("period"),
        col("n_active"), col("n_new"),
        when(col("__p") === col("__mp"), lit(null).cast("long"))
          .otherwise(col("__ret")).as("n_retained"),
        when(col("__p") === col("__mp"), lit(null).cast("long"))
          .otherwise(col("n_active") - col("__ret")).as("n_churned"),
        when(col("__p") === col("__mp"), lit(null).cast("double"))
          .otherwise(round((col("n_active") - col("__ret")).cast("double") /
            col("n_active").cast("double"), 6)).as("churn_rate"))
  }

  /**
   * Daily growth accounting (the Social Capital decomposition): every
   * active day of every user is exactly one of `n_new` (first-ever
   * day), `n_retained` (also active the previous day), or
   * `n_resurrected` (returning after a gap) — so
   * `n_active = n_new + n_retained + n_resurrected` by construction —
   * and `n_churned` counts users active the previous day who did NOT
   * return today. Output one row per day of `[first activity,
   * last activity + 1]`; the trailing day exists because the last
   * active users all churn there (same absence-of-evidence honesty as
   * [[churn]]'s NULL last period, but here the successor day IS
   * observed to be empty within the log's span).
   *
   * Scale shape: one reduce to distinct (user, day) pairs, then ONE
   * user-keyed window (lag + running min) — the sessionize shuffle —
   * and a day-keyed count rollup; the churn flow reuses the same
   * window's lead. Pure integer/date arithmetic, no float policy.
   */
  def growthAccounting(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val pairs = events
      .where(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("day"))
      .distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("day"))
    val tagged = pairs
      .withColumn("__prev", lag(col("day"), 1).over(w))
      .withColumn("__next", lead(col("day"), 1).over(w))
    val status = tagged.groupBy(col("day")).agg(
      count(lit(1)).as("n_active"),
      count(when(col("__prev").isNull, lit(1))).as("n_new"),
      count(when(datediff(col("day"), col("__prev")) === 1, lit(1)))
        .as("n_retained"),
      count(when(col("__prev").isNotNull &&
        datediff(col("day"), col("__prev")) > 1, lit(1)))
        .as("n_resurrected"))
    // a user active on d churns at d+1 unless their next active day IS
    // d+1; credited to the day the absence is first observable
    val churnFlow = tagged
      .where(col("__next").isNull ||
        datediff(col("__next"), col("day")) > 1)
      .groupBy(date_add(col("day"), 1).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    status.join(churnFlow, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Per-user growth state: last active day (epoch days) and whether
    * that day's follow-on churn has already been published (so a
    * stream's timeout-driven churn and a later resurrection never
    * double-emit). */
  final case class GrowthState(lastDay: Long, churnEmitted: Boolean)

  /** One classified user-day: `status` ∈ new/retained/resurrected, or a
    * `churned` row dated the day the absence became observable. */
  final case class GrowthFlag(user: String, day: java.sql.Date, status: String)

  private def epochDate(d: Long): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d))

  /** The shared per-user growth fold — the SINGLE definition of the
    * new/retained/resurrected/churned classification, used by both the
    * batch [[growthFlags]] and the incremental [[growthFlagsStream]] so
    * the two cannot drift. `days` must be sorted ascending; duplicate
    * days no-op; a day at or behind the carried state no-ops (the
    * stream's late-arrival caveat — the watermark bounds how late). */
  private[graft] def foldGrowthDays(user: String, days: Array[Long],
                                    init: Option[GrowthState])
      : (List[GrowthFlag], Option[GrowthState]) = {
    var state = init
    var out = List.empty[GrowthFlag]
    days.foreach { d =>
      state match {
        case None =>
          out ::= GrowthFlag(user, epochDate(d), "new")
          state = Some(GrowthState(d, churnEmitted = false))
        case Some(s) if d <= s.lastDay => () // duplicate or late day
        case Some(s) if d == s.lastDay + 1 =>
          out ::= GrowthFlag(user, epochDate(d), "retained")
          state = Some(GrowthState(d, churnEmitted = false))
        case Some(s) => // gap: the old day's churn plus a resurrection
          if (!s.churnEmitted)
            out ::= GrowthFlag(user, epochDate(s.lastDay + 1), "churned")
          out ::= GrowthFlag(user, epochDate(d), "resurrected")
          state = Some(GrowthState(d, churnEmitted = false))
      }
    }
    (out.reverse, state)
  }

  /**
   * Per-user-day growth classification — [[growthAccounting]] BEFORE the
   * day rollup: one row per active (user, day) tagged
   * new/retained/resurrected plus one `churned` row per exit (dated
   * day+1, including every user's trailing exit after their last active
   * day). Grouping by (day, status) reproduces [[growthAccounting]]
   * exactly; the per-user rows are what audits and per-segment slicing
   * need.
   *
   * Scale shape: one reduce to distinct (user, day) pairs, then one
   * user-keyed groupByKey whose per-group state is the sorted day list
   * (bounded by a user's active-day count, the same cardinality the
   * window variant shuffles).
   */
  def growthFlags(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(tsCol).isNotNull && col(userCol).isNotNull)
      .select(col(userCol).cast("string").as("u"),
        datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .distinct()
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (u: String, it: Iterator[(String, Long)]) =>
        val days = it.map(_._2).toArray.sorted
        val (flags, st) = foldGrowthDays(u, days, None)
        // the batch sees the whole log, so every user's trailing exit is
        // observable: churn at lastDay + 1 (growthAccounting parity)
        val trailing = st.map(s =>
          GrowthFlag(u, epochDate(s.lastDay + 1), "churned"))
        (flags ++ trailing).iterator
      }
      .toDF("user", "day", "status")
  }

  /**
   * Streaming growth accounting — the canonical incremental computation
   * (per-user last-seen state + per-day flags) as a continuous query:
   * the same [[foldGrowthDays]] classification over arriving events,
   * with gap churn emitted inline and trailing churn emitted by
   * event-time TIMEOUT once the watermark proves the user's next day
   * stayed empty (timeout at the end of lastDay + 1). State per user is
   * one (lastDay, churnEmitted) pair — bounded by user cardinality, the
   * same bound the batch rollup shuffles; `churnEmitted` stops a
   * timeout-churned user's later resurrection from re-publishing the
   * same exit.
   *
   * Parity caveat (inherent, stated honestly): days are processed in
   * sorted order within each micro-batch; an event arriving in a LATER
   * batch for a day at or behind the user's carried state no-ops, so
   * exact batch parity holds when each user's days arrive in
   * non-decreasing batch order (the watermark bounds the damage window).
   * Cross-checked row-for-row against [[growthFlags]] in
   * StreamingGrowthCrossCheckSpec.
   *
   * REQUIRES a UTC session (asserted, same contract as
   * [[graft.streaming.StreamingPipeline.psiStream]]): days bucket as
   * UTC epoch days in the state closure while the batch twin uses
   * session-timezone `to_date`, so parity only holds under UTC.
   */
  def growthFlagsStream(stream: DataFrame, tsCol: String, userCol: String,
                        watermarkDelay: String = "10 minutes"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    graft.streaming.StreamingPipeline.requireUtcSession(
      spark, "growthFlagsStream")
    import spark.implicits._
    stream
      .select(col(userCol).cast("string").as("u"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[GrowthState, GrowthFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (u, events, state) =>
          if (state.hasTimedOut) {
            // watermark passed the end of lastDay + 1 with no activity:
            // the exit is now observable. Keep the state (a later return
            // must classify as resurrected, not new) but mark the churn
            // published; no new timeout until the user returns.
            val s = state.get
            state.update(GrowthState(s.lastDay, churnEmitted = true))
            Iterator(GrowthFlag(u, epochDate(s.lastDay + 1), "churned"))
          } else {
            val days = events.map(_._2.getTime / 86400000L)
              .toArray.distinct.sorted
            val (flags, st) = foldGrowthDays(u, days, state.getOption)
            st.foreach { s =>
              state.update(s)
              // churn at lastDay+1 is observable once the watermark
              // passes the END of that day = start of lastDay + 2
              if (!s.churnEmitted)
                state.setTimeoutTimestamp((s.lastDay + 2) * 86400000L)
            }
            flags.iterator
          }
      }
      .toDF("user", "day", "status")
  }
}
