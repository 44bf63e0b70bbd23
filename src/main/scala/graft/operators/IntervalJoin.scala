package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join — match point events to time ranges
 * (`start <= ts < end`): campaign attribution, maintenance windows,
 * session containment. The reference has no range joins at all
 * (SURVEY §2.5); DuckDB's optimizer turns the plain inequality join into
 * an IEJoin, which is this operator's test oracle (`q_interval_join`).
 *
 * Spark-first plan — time-bin equi-join + refine, NOT the naive theta
 * join: Spark plans `p JOIN r ON p.ts >= r.start AND p.ts < r.end` as a
 * BroadcastNestedLoopJoin (or a cartesian product when neither side
 * fits in memory) — |P|×|R| comparisons, a guaranteed scale killer.
 * Instead both sides are keyed by a fixed-width time bin: each point
 * lands in exactly ONE bin, each range explodes to the bins it overlaps,
 * and the join becomes an ordinary equi-join on (bin, keys…) with the
 * interval predicate as a post-join refine. Catalyst then picks
 * broadcast-hash or sort-merge like any other join, AQE handles skew,
 * and the comparison count drops from |P|×|R| to Σ_bin |P_bin|×|R_bin|.
 *
 * No dedup pass is needed: a (point, range) pair can only meet in the
 * point's single bin, so each match is emitted exactly once.
 *
 * `binSeconds` trades explode factor against bin selectivity: a range
 * spanning w seconds lands in ceil(w / bin) + 1 bins, so pick the bin
 * near the p95 range width (default 1 day). Ranges much longer than the
 * bin only cost linearly more exploded rows — never quadratic work.
 */
object IntervalJoin {

  /**
   * Inner-join `points` to every row of `ranges` whose half-open
   * interval [`rangeStart`, `rangeEnd`) contains `pointTs`, optionally
   * also matching `keys` (same column names on both sides; the output
   * keeps the point side's copy). Zero-width and inverted ranges match
   * nothing; NULL timestamps and bounds drop out (SQL join semantics).
   */
  def join(points: DataFrame, ranges: DataFrame, pointTs: String,
           rangeStart: String, rangeEnd: String,
           keys: Seq[String] = Nil,
           binSeconds: Long = 86400L): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val binMicros = binSeconds * 1000000L
    val pMicros = graft.functions.TimeFunctions.epochMicrosSql(pointTs)
    val sMicros = graft.functions.TimeFunctions.epochMicrosSql(rangeStart)
    val eMicros = graft.functions.TimeFunctions.epochMicrosSql(rangeEnd)
    val p = points.withColumn("__bin",
      expr(s"floor($pMicros / ${binMicros}L)"))
    val r = ranges
      .where(col(rangeEnd) > col(rangeStart))
      .withColumn("__bin", explode(expr(
        s"sequence(floor($sMicros / ${binMicros}L), " +
          s"floor(($eMicros - 1) / ${binMicros}L))")))
    val cond = (Seq(p("__bin") === r("__bin")) ++ keys.map(k => p(k) === r(k)))
      .reduce(_ && _) &&
      p(pointTs) >= r(rangeStart) && p(pointTs) < r(rangeEnd)
    val joined = p.join(r, cond, "inner")
    // one __bin per side plus the right copy of each shared key — keep the
    // point side's columns, like StageCompiler.compileJoin's key dedup
    val dropRight = keys.map(r(_)) :+ r("__bin")
    dropRight.foldLeft(joined)(_.drop(_)).drop("__bin")
  }
}
