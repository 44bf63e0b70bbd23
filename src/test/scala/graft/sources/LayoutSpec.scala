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
