package graft.operators

import graft.functions.TimeFunctions.epochMicros
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch sessionization — the window-function analogue of
 * [[graft.streaming.StreamingPipeline.sessionize]] (same gap semantics,
 * so the two can cross-check each other): a new session starts where the
 * gap to the previous event of the same key exceeds `gapSeconds`; a
 * running sum over the new-session flags numbers the sessions.
 *
 * Scale shape: two window passes over the same (key, ts) partitioning —
 * ONE shuffle total (the second window reuses the first's partitioning,
 * visible as a single Exchange in the plan), then a partial-aggregated
 * groupBy. Per-key data must fit a task's sort spill budget, which holds
 * whenever per-key event counts are bounded (the usual user-activity
 * shape); a pathological single hot key wants Skew-style pre-splitting.
 */
object Sessionize {

  /** One row per (key, session): bounds + event count. */
  def batch(df: DataFrame, tsCol: String, keyCol: String,
            gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol))
    // microsecond arithmetic: full timestamp precision, no truncation
    val newSession = when(
      epochMicros(col(tsCol)) - epochMicros(lag(col(tsCol), 1).over(byKey))
        > gapSeconds * 1000000L, 1).otherwise(0)
    df.select(col(keyCol), col(tsCol))
      .withColumn("__new", coalesce(newSession, lit(0)))
      .withColumn("session_id", sum(col("__new")).over(byKey))
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
