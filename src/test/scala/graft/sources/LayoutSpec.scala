package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {

  test("zValue produces known Morton codes") {
    val out = spark.range(1)
      .select(
        Layout.zValue(Seq(lit(1L), lit(1L)), 8).as("a"),  // 1|2
        Layout.zValue(Seq(lit(2L), lit(0L)), 8).as("b"),  // x bit1 -> pos 2
        Layout.zValue(Seq(lit(3L), lit(5L)), 8).as("c"),  // 5 + 34
        Layout.zValue(Seq(lit(259L), lit(5L)), 8).as("d") // 259 aliases to 3
      ).head()
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      == ((3L, 4L, 39L, 39L)))
  }

  test("z-clustered layout prunes most partitions for a second-dimension filter") {
    // a full 256x256 grid: x is the "primary" dim a naive layout sorts on
    val pts = spark.range(256L * 256L).select(
      (col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"))
    val parts = 16
    // pin partition ids BEFORE the predicate: a filter would otherwise
    // push below the repartition and re-derive range bounds from the
    // filtered data (spark_partition_id is nondeterministic, so the
    // filter cannot reorder past this projection)
    def touched(df: DataFrame, pred: Column): Long =
      df.withColumn("p", spark_partition_id())
        .filter(pred).select("p").distinct().count()

    val zed = pts
      .withColumn("__z", Layout.zValue(Seq(col("x"), col("y")), 8))
      .repartitionByRange(parts, col("__z"))
    val xSorted = pts.repartitionByRange(parts, col("x"))

    val yBand = col("y") < 16
    assert(touched(xSorted, yBand) == parts) // x-sort: every file has the band
    assert(touched(zed, yBand) <= parts / 2) // z: the band zeroes high y-bits
    // and the primary dimension still prunes under z too
    assert(touched(zed, col("x") < 16) <= parts / 2)
  }

  private def grid(n: Int) = spark.range(n.toLong * n).select(
    (col("id") / n).cast("long").as("x"), (col("id") % n).as("y"))

  test("scaledZValue maps min/max to the full bit range exactly") {
    val out = Layout.scaledZValue(grid(4), Seq("x", "y"), bits = 2)
      .orderBy("x", "y").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // min 0, max 3 → scaled = identity; x at even bits, y at odd
    assert(out((0L, 0L)) == 0L)
    assert(out((3L, 0L)) == 5L)   // 0b0101
    assert(out((0L, 3L)) == 10L)  // 0b1010
    assert(out((1L, 2L)) == 9L)   // 0b1001
    assert(out((3L, 3L)) == 15L)
  }

  test("scaledZValue gives a constant column all-zero bits") {
    val two = spark.range(2).select(
      (col("id") * 4 + 5).as("x"), lit(7L).as("y"))
    val z = Layout.scaledZValue(two, Seq("x", "y"), bits = 2)
      .orderBy("x").collect().map(_.getLong(2))
    // y constant → zero; x scales to 0 and 3 → z = 0b0101 = 5
    assert(z.toSeq == Seq(0L, 5L))
  }

  test("pruningAudit shows tight per-bucket ranges on BOTH columns") {
    val audit = Layout.pruningAudit(grid(8), Seq("x", "y"), bits = 3,
        buckets = 4)
      .orderBy("bucket").collect()
    // 4 buckets = the 4 z-quadrants, 16 rows each, each column spanning
    // half its global range — the clustering a linear sort can't give
    // both columns at once.
    assert(audit.length == 4)
    assert(audit.forall(_.getLong(1) == 16L))
    assert(audit.forall(r => r.getLong(3) - r.getLong(2) <= 3L)) // x span
    assert(audit.forall(r => r.getLong(5) - r.getLong(4) <= 3L)) // y span
  }

  test("pruneProbe counts skippable buckets by min/max overlap") {
    val out = Layout.pruneProbe(grid(8), Seq("x", "y"), "x", 0L, 3L,
      bits = 3, buckets = 4).collect().head
    // x BETWEEN 0 AND 3 hits the two x<4 quadrants; the other two are
    // pruned → half the rows skipped.
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3),
      out.getDouble(4)) == ((4L, 2L, 64L, 32L, 0.5)))
  }

  test("clusterByZ yields a total z-order across partitions") {
    val pts = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val out = Layout.clusterByZ(pts, Seq("x", "y"), bits = 6, partitions = 8)
    // recompute z per row with its partition: ranges must not overlap
    val ranges = out
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("p").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 <= lo2
      case _ => true
    })
  }
}
