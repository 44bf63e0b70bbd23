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
}
