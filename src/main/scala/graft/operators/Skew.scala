package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for hot keys — the failure mode AQE cannot always fix:
 * AQE's skew-join splitting rescues sort-merge joins after a shuffle has
 * already materialized, and does nothing for single-hot-key AGGREGATIONS,
 * where one reducer receives a constant fraction of the corpus (a
 * "language = en" style key at 100 TB is one task with 30 TB of input).
 *
 * Both helpers avoid `rand()`: the salt is the row's position
 * (`monotonically_increasing_id` mod buckets) — uniform by construction,
 * so even N identical duplicate rows of a hot key spread across all
 * buckets (a row-content hash would send them to ONE reducer, the exact
 * failure being fixed), and no column type (maps, structs) can break it.
 * Deterministic for a fixed input partitioning; the RESULT is identical
 * under any salt assignment (spec-pinned against unsalted plans).
 */
object Skew {

  private def rowSalt(buckets: Int): Column =
    pmod(monotonically_increasing_id(), lit(buckets.toLong))

  /** A re-aggregable aggregate: SUM/COUNT/MIN/MAX (+AVG via SUM+COUNT). */
  final case class SaltedAgg(function: String, column: String, alias: String)

  /**
   * Two-phase hot-key-safe aggregation: groupBy(keys :+ salt) computes
   * partial aggregates over `buckets` shards of every key, then a second
   * groupBy(keys) merges shard results — the hot key's work spreads over
   * `buckets` reducers and the merge handles `buckets` rows per key.
   *
   * Functions must be decomposable: SUM (sum of sums), COUNT (sum of
   * counts), MIN/MAX (min of mins / max of maxes), AVG (sum/count pair,
   * divided in the merge projection). This is exactly the map-side-combine
   * trick one level up: Spark's partial aggregation already combines
   * within a task; salting additionally splits a key ACROSS reducers.
   */
  def saltedAggregate(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
                      buckets: Int = 16): DataFrame = {
    require(keys.nonEmpty && aggs.nonEmpty && buckets >= 1)
    val salt = rowSalt(buckets).as("__salt")

    def partial(a: SaltedAgg, i: Int): Seq[Column] = a.function.toUpperCase match {
      case "SUM"   => Seq(sum(expr(a.column)).as(s"__p$i"))
      case "COUNT" => Seq((if (a.column.trim == "*") count(lit(1)) else count(expr(a.column))).as(s"__p$i"))
      case "MIN"   => Seq(min(expr(a.column)).as(s"__p$i"))
      case "MAX"   => Seq(max(expr(a.column)).as(s"__p$i"))
      case "AVG"   => Seq(sum(expr(a.column)).as(s"__p${i}_s"), count(expr(a.column)).as(s"__p${i}_c"))
      case other   => throw new IllegalArgumentException(
        s"'$other' is not decomposable for salted aggregation (SUM/COUNT/MIN/MAX/AVG)")
    }
    def merge(a: SaltedAgg, i: Int): Seq[Column] = a.function.toUpperCase match {
      case "SUM"   => Seq(sum(col(s"__p$i")).as(a.alias))
      case "COUNT" => Seq(sum(col(s"__p$i")).as(a.alias))
      case "MIN"   => Seq(min(col(s"__p$i")).as(a.alias))
      case "MAX"   => Seq(max(col(s"__p$i")).as(a.alias))
      case "AVG"   => Seq(sum(col(s"__p${i}_s")).as(s"__m${i}_s"), sum(col(s"__p${i}_c")).as(s"__m${i}_c"))
    }

    val partials = aggs.zipWithIndex.flatMap { case (a, i) => partial(a, i) }
    val merges = aggs.zipWithIndex.flatMap { case (a, i) => merge(a, i) }
    val merged = df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
    // AVG finalize: exact sums divided once per key (matches plain avg for
    // integer inputs; for doubles it is the same partial-sum tree shape).
    val finalCols = keys.map(col) ++ aggs.zipWithIndex.map { case (a, i) =>
      if (a.function.equalsIgnoreCase("AVG"))
        (col(s"__m${i}_s").cast("double") / col(s"__m${i}_c")).as(a.alias)
      else col(a.alias)
    }
    merged.select(finalCols: _*)
  }

  /**
   * Salted equi-join for a LARGE left with hot keys against a large-ish
   * right (too big to broadcast, small enough that `buckets`-fold
   * replication is acceptable — the classic mid-size dimension): the left
   * side gets a deterministic salt in [0, buckets), the right side is
   * replicated once per bucket, and the join key becomes (key, salt) — a
   * hot key's rows spread across `buckets` reducers.
   *
   * Supports inner/left joins (replication preserves their semantics:
   * every left row sees the full right partition for its key exactly
   * once). For broadcast-able rights, just use `broadcast()` — no shuffle,
   * no skew. For SMJ skew after the fact, AQE skew-join already splits.
   */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer").contains(joinType.toLowerCase),
      "salted join preserves semantics for inner/left joins only")
    val saltedLeft = left.withColumn("__salt", rowSalt(buckets))
    val replicatedRight = right
      .withColumn("__salt0", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt0").cast("long")).drop("__salt0")
    val joined = saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"),
        joinType)
      .drop("__salt")
    // Same-name keys (the common case in the stage algebra): keep the
    // LEFT side's key column, like the JOIN stage's key dedup — otherwise
    // the output carries two ambiguous columns of the same name.
    if (leftKey == rightKey) joined.drop(replicatedRight(rightKey)) else joined
  }
}
