package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental aggregate maintenance — the algebraic half of a
 * materialized view. A grouped aggregate over 100 TB is recomputable,
 * but a daily 0.1% delta shouldn't cost a full rescan: keep a per-key
 * PARTIAL STATE `(n, sum_dec, min_v, max_v)` and fold each new batch
 * into it; the finished metrics (count / total / min / max / avg) are
 * derivable from state alone. Maintenance cost then tracks the DELTA
 * size — the state table and the batch are the only inputs.
 *
 * Why these four accumulators: they are the commutative-monoid core
 * (count and sum add; min/max combine by min/max), so `merge` is a
 * plain union + re-aggregate — one shuffle over STATE ROWS (≤ one per
 * key per input), never over base data. avg is deliberately NOT stored:
 * it is not mergeable, but is exactly derivable as sum/count at finish.
 *
 * Deletions: sum/count are groups (invertible — fold in a NEGATED
 * state), min/max are not (deleting the current max needs the base
 * data to find the runner-up). [[retract]] therefore maintains only the
 * invertible accumulators and drops min/max from its output; a pipeline
 * needing min/max under deletes re-derives them from the base — that
 * asymmetry is fundamental, not an implementation gap.
 *
 * The sum accumulates as DECIMAL(28,2), making the merged total exact
 * and independent of batch arrival order (a double sum would drift by
 * grouping); outputs cast back to DOUBLE per the repo's cross-engine
 * determinism convention.
 */
object IncrementalAgg {

  private val stateCols = Seq("n", "sum_dec", "min_v", "max_v")

  /** Per-key partial state for one batch: `keys..., n, sum_dec, min_v,
    * max_v`. `n` counts non-NULL values, pairing with `sum_dec` so
    * avg = sum/n at finish. One map-side-combined aggregation. */
  def state(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast("decimal(18,2)")).as("sum_dec"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Fold any number of partial states into one: union + re-aggregate.
    * Associative and commutative, so batches can merge in any order or
    * tree shape (daily → monthly → total). The shuffle carries only
    * state rows. Sum widths: n and sum_dec re-SUM; min/max re-MIN/MAX. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "at least one state")
    states
      .map(_.select((keys ++ stateCols).map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_dec").cast("decimal(28,2)")).as("sum_dec"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Remove a delete-batch from the state: fold in the deletes' state
    * with n and sum negated, then drop keys whose count reaches zero.
    * min/max are NOT invertible and are dropped from the output (see
    * object doc). The deletes must be rows previously folded in —
    * retracting unseen rows undercounts, as in any CDC ledger. */
  def retract(base: DataFrame, deletes: DataFrame, keys: Seq[String],
              valueCol: String): DataFrame = {
    val neg = state(deletes, keys, valueCol)
      .withColumn("n", -col("n"))
      .withColumn("sum_dec", -col("sum_dec"))
    merge(keys, base, neg)
      .filter(col("n") > 0)
      .drop("min_v", "max_v")
  }

  /** Final metrics from state: exact total (decimal cast to double) and
    * avg = CAST(sum AS DOUBLE)/n — the repo's deterministic-AVG shape.
    * A pure projection: finishing never touches base data. */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("n"),
        col("sum_dec").cast("double").as("total"),
        col("min_v"),
        col("max_v"),
        (col("sum_dec").cast("double") / col("n")).as("avg_v")): _*)
}
