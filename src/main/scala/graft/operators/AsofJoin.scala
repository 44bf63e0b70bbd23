package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time (as-of) join — the feature-lookup primitive of ML data
 * pipelines ("the last reading/price/profile at or before each event
 * time"), which Spark has no built-in operator for (the reference
 * delegates everything to DuckDB, whose `ASOF JOIN` is this operator's
 * test oracle).
 *
 * Spark-first plan — union + one window pass, NOT a range join: left and
 * right rows are tagged and unioned on a common layout, sorted within
 * each key partition by (event time, side) with right rows first at
 * equal timestamps (so a right row AT the left timestamp matches — the
 * `>=` convention, like DuckDB's default), and a single
 * `last(…, ignoreNulls)` window fill carries the most recent right
 * payload forward onto each left row. That is ONE shuffle of
 * |left| + |right| rows total, regardless of time-range density —
 * whereas the naive `l JOIN r ON key AND r.ts <= l.ts` + argmax
 * materializes every (left, earlier-right) pair first: quadratic per key
 * and a guaranteed scale killer on long histories.
 *
 * The right payload travels as ONE struct column, so a single window
 * expression fills all value columns, and legitimately-null payload
 * fields are preserved exactly (the fill never "looks through" a matched
 * row into older rows — the struct itself is only null on left rows).
 *
 * Skew note: each key's full timeline lands in one task's sort — the
 * usual bounded-per-key shape is fine; a pathological hot key wants a
 * coarse time-bucket pre-split (carry the previous bucket's last right
 * row into the next bucket), same discipline as [[Skew]].
 */
object AsofJoin {

  /**
   * For each left row, attach `valueCols` from the most recent right row
   * with the same `keys` and right timestamp ≤ the left timestamp.
   *
   * `right` must carry `keys` under the same names; `rightTs` may differ
   * from `leftTs` (and may itself appear in `valueCols` to surface the
   * matched timestamp). `joinType` "inner" drops left rows with no prior
   * right row; "left" keeps them with null values.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               joinType: String = "inner"): DataFrame = {
    val inner = joinType.toLowerCase match {
      case "inner"               => true
      case "left" | "left_outer" => false
      case other => throw new IllegalArgumentException(
        s"as-of join supports inner/left, not '$other'")
    }
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val lcols = left.columns.toSeq
    val collisions = valueCols.filter(lcols.contains)
    require(collisions.isEmpty,
      s"value columns ${collisions.mkString(", ")} collide with left columns — rename on the right first")

    val rhsPacked = right
      .select(keys.map(col) :+ col(rightTs).as("__ets") :+
        struct(valueCols.map(col): _*).as("__pack"): _*)
      .withColumn("__side", lit(0))
    val packType = rhsPacked.schema("__pack").dataType
    val lhs = left
      .withColumn("__ets", col(leftTs))
      .withColumn("__pack", lit(null).cast(packType))
      .withColumn("__side", lit(1))
    val rhs = lcols.filterNot(keys.contains).foldLeft(rhsPacked) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val layout = (lcols ++ Seq("__ets", "__side", "__pack")).map(col)
    val unioned = lhs.select(layout: _*).unionByName(rhs.select(layout: _*))

    // right rows sort BEFORE left rows at equal time → `>=` match semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ets").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__pack", last(col("__pack"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val kept = if (inner) filled.filter(col("__pack").isNotNull) else filled
    kept.select(lcols.map(col) ++ valueCols.map(c => col("__pack")(c).as(c)): _*)
  }
}
