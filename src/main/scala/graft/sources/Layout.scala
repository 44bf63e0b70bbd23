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

  /**
   * [[zValue]] with the dimension mapping done for the caller: each
   * column is min/max-scaled into `[0, 2^bits)` with EXACT integer
   * arithmetic, `((x − min)·(2^bits − 1)) div max(max − min, 1)` — no
   * doubles, so an external engine replays it bit-for-bit. One min/max
   * aggregate over the corpus (a scalar row, joined back broadcast),
   * then the interleave is the same codegen'd expression as [[zValue]].
   * Adds `__z`. Inputs cast to BIGINT (pre-bucket fractional columns);
   * a constant column scales to all-zero bits. The intermediate product
   * `(max − min)·(2^bits − 1)` must fit a Long — 8–16 bits over id-like
   * columns is the intended regime.
   */
  def scaledZValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    val n = cols.size
    require(n >= 1 && bits >= 1 && bits * n <= 62,
      s"bits*cols must be in [1,62], got ${bits * n}")
    val levels = (1L << bits) - 1
    val aggCols = cols.zipWithIndex.flatMap { case (c, k) =>
      Seq(min(col(c).cast("long")).as(s"__mn$k"),
        max(col(c).cast("long")).as(s"__mx$k"))
    }
    val stats = df.groupBy().agg(aggCols.head, aggCols.tail: _*)
    val scaled = cols.zipWithIndex.map { case (c, k) =>
      expr(s"((CAST(`$c` AS BIGINT) - __mn$k) * ${levels}L) div " +
        s"greatest(__mx$k - __mn$k, 1L)")
    }
    df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue(scaled, bits))
      .drop((0 until n).flatMap(k => Seq(s"__mn$k", s"__mx$k")): _*)
  }

  /** [[scaledZValue]] plus `__bucket`: the linear z-range bucket
    * `(z · buckets) div 2^(bits·n)` in `[0, buckets)` — a deterministic
    * stand-in for "which output file" that the audit gates and their
    * oracle share (production writes use [[clusterByZ]]'s sampled
    * range partitioner instead, which balances files under z-space
    * skew at the price of determinism of the BOUNDARIES only). */
  def zorderBuckets(df: DataFrame, cols: Seq[String], bits: Int = 8,
                    buckets: Int = 16): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val span = 1L << (bits * cols.size)
    scaledZValue(df, cols, bits)
      .withColumn("__bucket", expr(s"(__z * ${buckets}L) div ${span}L"))
  }

  /** Per-bucket pruning stats: `(bucket, n_rows, <c>_min, <c>_max …)`
    * — exactly what a parquet footer holds per file after a z-order
    * layout; tight per-bucket ranges on EVERY column at once are the
    * whole point. Empty buckets (z-space holes) are absent. */
  def pruningAudit(df: DataFrame, cols: Seq[String], bits: Int = 8,
                   buckets: Int = 16): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("long")).as(s"${c}_min"),
        max(col(c).cast("long")).as(s"${c}_max"))
    }
    zorderBuckets(df, cols, bits, buckets)
      .groupBy(col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Skipping power of the layout for one range predicate
    * `probeCol BETWEEN lo AND hi`: one row `(n_buckets, n_overlapping,
    * rows_total, rows_scanned, frac_pruned)` where a bucket is scanned
    * iff its [min,max] intersects [lo,hi] — the min/max file-skipping
    * rule every parquet reader applies. */
  def pruneProbe(df: DataFrame, cols: Seq[String], probeCol: String,
                 lo: Long, hi: Long, bits: Int = 8,
                 buckets: Int = 16): DataFrame = {
    val audit = pruningAudit(df, cols, bits, buckets)
    val overlaps = col(s"${probeCol}_min") <= hi && col(s"${probeCol}_max") >= lo
    audit.groupBy().agg(
      count(lit(1)).as("n_buckets"),
      sum(overlaps.cast("long")).as("n_overlapping"),
      sum(col("n_rows")).as("rows_total"),
      sum(when(overlaps, col("n_rows")).otherwise(lit(0L))).as("rows_scanned"))
      .withColumn("frac_pruned",
        round(lit(1.0) - col("rows_scanned").cast("double") / col("rows_total"), 6))
  }
}
