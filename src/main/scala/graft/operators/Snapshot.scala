package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diffing — the incremental-pipeline planner: compare
 * two versions of a dataset by id and content digest and classify every
 * id as `added` / `removed` / `changed` / `unchanged`. Downstream, only
 * `added`+`changed` rows re-enter the expensive passes (dedup, embed,
 * decode) and `removed` ids tombstone — reprocessing cost tracks the
 * CHANGE rate, not the corpus size.
 *
 * Scale shape: each side reduces to (id, 16-byte digest, marker) before
 * the one full-outer join on id — the shuffle carries digests, never
 * document bodies. Presence is tracked by a literal marker column, not
 * digest null-ness, so NULL content diffs correctly (a row whose text is
 * NULL is still a row).
 */
object Snapshot {

  /** `(id, status)` for every id on either side. */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           contentCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("__od"), lit(true).as("__op"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(contentCol)).as("__nd"), lit(true).as("__np"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(col("__od") <=> col("__nd"), "unchanged")
          .otherwise("changed"))
      .select("id", "status")
  }

  /** Change-rate rollup: `(status, n)` — the four classes, counts. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  contentCol: String): DataFrame =
    diff(oldDf, newDf, idCol, contentCol)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /**
   * The write half of incremental maintenance: apply a change batch to a
   * base snapshot — CDC upsert/delete merge semantics. `changes` carries
   * full rows plus an `opCol` of `upsert` (insert-or-replace by id) or
   * `delete` (tombstone). Result = base rows whose id has no change row,
   * plus the upsert rows. With `diff`, this closes the loop: reprocess
   * only added/changed, then merge the results back — snapshot N+1
   * without touching the untouched 99%.
   *
   * Scale shape: one left-anti join on id (base side streams through;
   * the change batch is the small side by definition and AQE broadcasts
   * it) plus a union — no window, no full-corpus shuffle when the
   * change batch broadcasts.
   */
  def applyChanges(base: DataFrame, changes: DataFrame, idCol: String,
                   opCol: String): DataFrame = {
    // bad op labels fail the JOB (raise_error in-plan — no extra driver
    // action) instead of silently dropping rows
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"applyChanges: unknown op in $opCol: "), col(opCol)))))
    base.join(checked.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(checked.filter(col(opCol) === "upsert").drop(opCol))
  }

  /**
   * Slowly-changing-dimension type-2 history build: turn an event/change
   * log `(key, ts, attributes…)` into validity intervals —
   * `(key, attributes…, valid_from, valid_to, is_current)` with
   * `valid_to` = the NEXT change's timestamp (half-open `[from, to)`,
   * NULL on the open current row). Consecutive rows whose attributes
   * did not change are collapsed into the earlier interval first
   * (a no-op change must not split history — the classic SCD2 dedup),
   * compared via a null-sentinel digest so NULL attributes participate.
   *
   * Contract: at most one change per `(key, ts)` (enforce upstream with
   * dedup; with duplicates the digest tie-break keeps the output
   * deterministic but which duplicate wins is arbitrary).
   *
   * Scale shape: two windows over the same `(key, ts)` partitioning —
   * one lag to drop no-ops, one lead to close intervals — so the corpus
   * shuffles ONCE by key and both windows reuse the sort.
   */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String,
           attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val digest = md5(concat_ws("\u0001",
      attrCols.map(c => coalesce(col(c).cast("string"), lit("\u0000."))): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col("__d"))
    val deduped = changes
      .withColumn("__d", digest)
      .withColumn("__pd", lag(col("__d"), 1).over(w))
      .filter(col("__pd").isNull || col("__pd") =!= col("__d"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col("__d"))
    deduped
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: attrCols.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }
}
