package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * OLAP shapes beyond the reference's flat GROUP BY (SURVEY §2.1 row 5 is
 * single-level grouping only): multi-level subtotals (ROLLUP), the full
 * dimension lattice (CUBE), and wide activity matrices (PIVOT) — the
 * reporting layer of a corpus-statistics dashboard.
 *
 * All three are single-shuffle in Spark: rollup/cube expand each input
 * row to its grouping sets BEFORE the exchange (map-side), then aggregate
 * once — no per-level re-scan; pivot is a plain hash aggregate whose
 * values are laid out as columns. `grouping_id()` disambiguates a NULL
 * group value from an aggregated-out level, matching SQL-standard
 * GROUPING() bit order (first column = most significant bit).
 */
object Olap {

  /** Subtotal levels: (a,b), (a), () for `groupCols` = a,b — plus a
    * `gid` column (grouping_id) so subtotal rows are self-describing. */
  def rollupAgg(df: DataFrame, groupCols: Seq[String],
                aggs: Seq[Column]): DataFrame =
    df.rollup(groupCols.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"), aggs: _*)

  /** Every subset of `groupCols` — the full cross-dimension lattice. At
    * scale prefer [[rollupAgg]] unless all 2^n levels are really read:
    * cube multiplies the pre-shuffle row expansion by 2^n. */
  def cubeAgg(df: DataFrame, groupCols: Seq[String],
              aggs: Seq[Column]): DataFrame =
    df.cube(groupCols.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"), aggs: _*)

  /**
   * Arbitrary grouping-set lattices — the shapes ROLLUP/CUBE can't
   * express (e.g. two INDEPENDENT subtotal dimensions without their
   * cross product). Same single-shuffle execution: each input row
   * expands map-side to one row per set it participates in, then one
   * hash aggregate. `groupCols` fixes the output column order and the
   * `grouping_id` bit order (first column = MSB) regardless of which
   * sets mention which columns.
   */
  def groupingSetsAgg(df: DataFrame, sets: Seq[Seq[String]],
                      groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(sets.nonEmpty, "at least one grouping set")
    require(sets.forall(_.forall(groupCols.contains)),
      "every set column must appear in groupCols")
    df.groupingSets(sets.map(_.map(col)), groupCols.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"), aggs: _*)
  }

  /**
   * Count matrix: one row per `rowCol` value, one column per entry of
   * `values` (the pivoted `pivotCol` domain). `values` is REQUIRED — an
   * explicit domain keeps the output schema deterministic and skips the
   * extra distinct-collect job Spark otherwise runs to discover it (a
   * full scan at 100 TB). Empty cells are 0, not NULL (SQL conditional
   * aggregation semantics, and what a reader of a count matrix expects).
   */
  def pivotCount(df: DataFrame, rowCol: String, pivotCol: String,
                 values: Seq[String]): DataFrame = {
    val wide = df.groupBy(col(rowCol)).pivot(pivotCol, values).agg(count(lit(1)))
    values.foldLeft(wide)((d, v) => d.withColumn(v, coalesce(col(s"`$v`"), lit(0L))))
  }

  /**
   * Inverse of pivot (melt): widen-to-long over `valueCols`, keeping
   * `idCols` — `(idCols..., varName, valueName)`, one output row per
   * (input row × value column). Shuffle-free: Spark's native `unpivot`
   * plans as an Expand projection, the same map-side machinery
   * rollup/cube use, so the cost is output size and nothing else. All
   * `valueCols` must share one type (enforced by the plan — melt
   * mixed-type columns through an explicit cast first).
   */
  def unpivot(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
              varName: String = "metric",
              valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valueName)

  /**
   * ABC (Pareto-class) analysis: keys ranked by descending value mass,
   * classed `A` while the running share is ≤ `aCut` (default 0.8), `B`
   * up to `bCut` (0.95), `C` after — "which 20% of parts carry 80% of
   * revenue?". Output `(key, value, share, cum_share, abc)` with
   * `value` the exact DECIMAL(18,2) per-key sum and shares at 6 dp.
   * The class boundary uses the PREVIOUS key's cumulative share
   * (first-over-the-line still belongs to the class it completes),
   * NULL-key rows drop, and ties order by key so ranks are a pure
   * function of the data.
   *
   * Scale shape: one map-side-combined per-key sum (|keys| ≪ rows),
   * then one ordered window over the KEY table only. |keys| is the
   * dimension cardinality — if that itself is corpus-sized, ABC is the
   * wrong question.
   */
  def abcClassification(df: DataFrame, keyCol: String, valueCol: String,
                        aCut: Double = 0.8,
                        bCut: Double = 0.95): DataFrame = {
    require(aCut > 0.0 && aCut < bCut && bCut < 1.0,
      s"need 0 < aCut < bCut < 1, got ($aCut, $bCut)")
    val perKey = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).as("value"))
    // bounded-window: key-domain — ABC ranks the declared catalog dimension; the output is itself |keys| rows
    val wOrd = org.apache.spark.sql.expressions.Window
      .orderBy(col("value").desc, col("key").asc)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    perKey
      .withColumn("__cum", sum(col("value")).over(wOrd))
      .withColumn("__tot", sum(col("value")).over(tot))
      .withColumn("__prev",
        round((col("__cum") - col("value")).cast("double") /
          col("__tot").cast("double"), 9))
      .select(col("key"),
        // exact decimal ranking above; DOUBLE publish (the repo-wide
        // no-decimal-output policy — decimal rendering differs across
        // engines)
        col("value").cast("double").as("value"),
        round(col("value").cast("double") /
          col("__tot").cast("double"), 6).as("share"),
        round(col("__cum").cast("double") /
          col("__tot").cast("double"), 6).as("cum_share"),
        when(col("__prev") < aCut, lit("A"))
          .when(col("__prev") < bCut, lit("B"))
          .otherwise(lit("C")).as("abc"))
  }
}
