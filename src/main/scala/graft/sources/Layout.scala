package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional clustering for data skipping. Parquet readers prune
 * files/row-groups by min-max statistics, but a layout sorted on ONE
 * column only skips for that column — a filter on any other dimension
 * touches every file. Interleaving the bits of k dimensions into a
 * Z-order (Morton) key and range-partitioning + sorting on it gives
 * every dimension locality: a predicate on ANY of the k columns
 * constrains the z-range, so most files fall outside its min-max and
 * never load. This is the layout lever at 100 TB — the same scan with a
 * z-clustered layout reads a small fraction of the files that a
 * single-column sort would (LayoutSpec measures exactly this).
 *
 * The key is built from codegen'd built-ins only (shift/mask/add — no
 * UDF): bit i of dimension j lands at position `i*k + j`.
 */
object Layout {

  /** Morton key over `cols`: each dimension contributes its low `bits`
    * bits, interleaved. Callers map dimensions into `[0, 2^bits)` first
    * (modulo, bucketed rank, or hash) — higher bits are ignored by
    * construction, which aliases distant values onto one cell; that
    * only costs locality, never correctness, since the key is a sort
    * key, not an identity. bits*k must fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1 && bits >= 1 && bits * k <= 62,
      s"bits*cols must be in [1,62], got ${bits * k}")
    cols.zipWithIndex.map { case (c, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Cluster `df` for writing: range-partition into `partitions` tasks
    * by the z-key and sort within each — a total z-order across files
    * (file N's z-range precedes file N+1's), one file per partition,
    * no global sort of the data itself beyond the range exchange. */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int,
                 partitions: Int): DataFrame = {
    val withZ = df.withColumn("__z", zValue(cols.map(df.col), bits))
    withZ.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
