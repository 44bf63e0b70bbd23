package graft.operators

import graft.functions.TimeFunctions.epochMicros
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-key rolling aggregates over EVENT time — "activity in the trailing
 * hour at each event" (rate limiting, burst detection, feature
 * engineering at training time). The reference has no window functions
 * at all (SURVEY §2.6); DuckDB evaluates the identical RANGE-frame SQL
 * as the oracle.
 *
 * The frame is a RANGE over epoch MICROSECONDS (integer order key), not
 * ROWS: rows sharing a timestamp are peers and always aggregate
 * together, so the result is deterministic under any shuffle order —
 * a ROWS frame over tied timestamps would not be. Integer microsecond
 * arithmetic is also engine-portable (no interval/float semantics).
 *
 * Scale shape: one shuffle on the key, then one ordered pass per
 * partition — Spark's sliding-frame evaluator adds/removes rows
 * incrementally at both frame edges, so a window holding k events costs
 * O(1) amortized per row, not O(k). The summed value is cast to
 * DECIMAL(18,2) first: the add/remove updates stay exact (a double
 * accumulator would drift under subtraction — and be order-dependent).
 * The final sum is cast back to DOUBLE per the repo's float-determinism
 * convention: the exact decimal is the ACCUMULATOR, never the output
 * type (decimal stringification is not canonical across engines).
 */
object Rolling {

  /**
   * For each row: count and exact sum of `valueCol` over this key's rows
   * in `[ts − windowSeconds, ts]` (inclusive trailing window). Output =
   * input columns + `n_window`, `sum_window`.
   */
  def trailingAgg(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 0, "windowSeconds must be >= 0")
    val micros = windowSeconds * 1000000L
    val w = Window.partitionBy(col(keyCol))
      .orderBy(epochMicros(col(tsCol)))
      .rangeBetween(-micros, 0L)
    df.withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(col(valueCol).cast("decimal(18,2)")).over(w).cast("double"))
  }

  /**
   * Per-key event-sequence navigation — inter-event gaps and
   * next-event lookahead (dwell time, retry spacing, next-action
   * features). A ROWS-navigation window is only deterministic if the
   * ordering is total, so the sort key is (event time, `tieCol`) with
   * `tieCol` a unique id: ties on the timestamp alone would make
   * lag/lead shuffle-order-dependent. Gaps are integer microsecond
   * arithmetic (engine-portable; no interval types). Output = input
   * columns + `rn`, `gap_micros` (NULL for each key's first event),
   * `next_<valueCol>` (NULL for the last).
   *
   * Scale shape: one shuffle on the key, one ordered pass per
   * partition — lag/lead/row_number all ride the same window.
   */
  def keyedNav(df: DataFrame, keyCol: String, tsCol: String,
               tieCol: String, valueCol: String): DataFrame = {
    val t = epochMicros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(t, col(tieCol))
    df.withColumn("rn", row_number().over(w))
      .withColumn("gap_micros", t - lag(t, 1).over(w))
      .withColumn(s"next_$valueCol", lead(col(valueCol), 1).over(w))
  }
}
