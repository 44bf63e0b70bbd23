package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * One-pass column profiling — the engine-side version of the stats a
 * wrangling UI shows per column (row/null/distinct counts, value range):
 * every statistic for every column is computed in a SINGLE aggregation
 * over one scan (a wide `agg(...)` — partial aggregation map-side, one
 * tiny final row), then unpivoted driver-side into one row per column.
 * Profiling a 100 TB table costs exactly one scan, no shuffle of data
 * rows (the single-row exchange is bytes).
 *
 * `exactDistinct = false` (default) uses HyperLogLog++
 * (approx_count_distinct, ~2% error) — exact COUNT(DISTINCT) over many
 * columns at once forces either expand (rows × columns blowup) or
 * per-column passes; the sketch keeps the one-scan property. Flip it for
 * small/audit tables where the oracle needs exact counts.
 */
object Profile {

  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val cols = df.schema.fields
    def statsFor(f: StructField): Seq[Column] = {
      val c = col(f.name)
      Seq(
        count(lit(1)).as(s"${f.name}__rows"),
        count(lit(1)).minus(count(c)).as(s"${f.name}__nulls"),
        (if (exactDistinct) countDistinct(c) else approx_count_distinct(c))
          .as(s"${f.name}__distinct"),
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"))
    }
    val wide = df.agg(statsFor(cols.head).head,
      (statsFor(cols.head).tail ++ cols.tail.flatMap(statsFor)): _*)
    val row = wide.head()
    val spark = df.sparkSession
    val out = cols.toIndexedSeq.map { f =>
      (f.name,
        row.getAs[Long](s"${f.name}__rows"),
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        Option(row.getAs[String](s"${f.name}__min")).orNull,
        Option(row.getAs[String](s"${f.name}__max")).orNull)
    }
    spark.createDataFrame(out)
      .toDF("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
