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
}
