package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * [[CumWalk]] must be value-identical to the unpartitioned
 * `Window.orderBy` plans it replaces — every test here computes the
 * same walk both ways on seeded pseudo-random cell tables and compares
 * row-for-row, including the NULL semantics of empty exclusive frames.
 * Tiny `buckets`/`sampleTarget` force multi-bucket plans (boundary
 * seams, empty buckets, duplicate boundaries) at test row counts.
 */
class CumWalkSpec extends SparkTestBase {
  import CumWalk._

  /** Pin the small-cell cutoff for a block: most tests force the
    * TWO-PASS path at test row counts (the production-hazard machinery
    * under test); the dedicated small-path tests use the default. */
  private def withCutoff[T](v: Long)(body: => T): T = {
    spark.conf.set(CumWalk.WindowCutoffConf, v.toString)
    try body finally spark.conf.unset(CumWalk.WindowCutoffConf)
  }

  // seeded LCG cells: unique keys (walk precondition), skewed values
  private def cellDf(n: Int, seed: Long, grouped: Boolean = false): DataFrame = {
    val rng = new scala.util.Random(seed)
    val keys = rng.shuffle((0 until n).toList)
    val rows = keys.map { k =>
      val key = math.rint((k * 0.731 - n * 0.3) * 1e6) / 1e6 // negative..positive, 6dp
      val c = (rng.nextInt(9) + 1).toLong
      val d = new java.math.BigDecimal(rng.nextInt(2000) - 1000)
        .movePointLeft(3).setScale(9)
      val g = if (grouped) s"g${rng.nextInt(3)}" else "g0"
      (g, key, c, d, rng.nextBoolean())
    }
    spark.createDataFrame(rows).toDF("g", "k", "c", "d", "b")
      .withColumn("d", col("d").cast("decimal(28,9)"))
  }

  private def sorted(df: DataFrame) =
    df.orderBy("g", "k").collect().map(_.toSeq.map(String.valueOf).mkString("|"))

  private def assertSame(viaWalk: DataFrame, viaWindow: DataFrame): Unit = {
    val a = sorted(viaWalk.select(viaWindow.columns.map(col): _*))
    val e = sorted(viaWindow)
    assert(a.length == e.length, s"${a.length} rows vs ${e.length}")
    a.zip(e).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs:\n  walk:   $x\n  window: $y")
    }
  }

  test("global asc inclusive long sum matches the single window") { withCutoff(1) {
    val cells = cellDf(500, 1)
    val w = Window.orderBy(col("k").asc) // test-only reference plan
    val out = walk(cells, "k", asc = true, Seq(CumSum("c", "cum")),
      buckets = 7, sampleTarget = 64)
    // no helper-column leakage: output schema = input + the spec outs
    // (a leaked __cw_ column would poison a SECOND walk over the result)
    assert(out.columns.toSeq == cells.columns.toSeq :+ "cum",
      s"got ${out.columns.toSeq}")
    assertSame(out, cells.withColumn("cum", sum("c").over(w)))
  }}

  test("global desc exclusive sum keeps the first row NULL") { withCutoff(1) {
    val cells = cellDf(301, 2)
    val w = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    assertSame(
      walk(cells, "k", asc = false, Seq(CumSum("c", "cumb", inclusive = false)),
        buckets = 5, sampleTarget = 32),
      cells.withColumn("cumb", sum("c").over(w)))
  }}

  test("global desc exclusive running max (the paretoFront2 shape)") { withCutoff(1) {
    val cells = cellDf(200, 3)
    val w = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    assertSame(
      walk(cells, "k", asc = false, Seq(CumMax("d", "rm", inclusive = false)),
        buckets = 6, sampleTarget = 24),
      cells.withColumn("rm", max("d").over(w)))
  }}

  test("grouped decimal sum + boolean max match the per-group window") { withCutoff(1) {
    val cells = cellDf(400, 4, grouped = true)
    val w = Window.partitionBy("g").orderBy(col("k").asc)
    assertSame(
      walk(cells, "k", asc = true,
        Seq(CumSum("d", "ds"), CumMax("b", "anyb")),
        partitionCols = Seq("g"), buckets = 4, sampleTarget = 16),
      cells.withColumn("ds", sum("d").over(w))
        .withColumn("anyb", max("b").over(w)))
  }}

  test("multiple sums in one walk (the logRank shape)") { withCutoff(1) {
    val cells = cellDf(256, 5).withColumn("c2", col("c") * 2 + 1)
    val w = Window.orderBy(col("k").asc)
    assertSame(
      walk(cells, "k", asc = true,
        Seq(CumSum("c", "ca"), CumSum("c2", "cb")),
        buckets = 9, sampleTarget = 16),
      cells.withColumn("ca", sum("c").over(w))
        .withColumn("cb", sum("c2").over(w)))
  }}

  test("degenerate inputs: empty, single row, fewer rows than buckets") {
    for (n <- Seq(0, 1, 3)) {
      val cells = cellDf(n, 10 + n)
      val w = Window.orderBy(col("k").asc)
      assertSame(
        walk(cells, "k", asc = true, Seq(CumSum("c", "cum"),
          CumMax("d", "dm", inclusive = false)),
          buckets = 8, sampleTarget = 8),
        cells.withColumn("cum", sum("c").over(w))
          .withColumn("dm", max("d").over(w.rowsBetween(
            Window.unboundedPreceding, -1))))
    }
  }

  test("small-cell path: at/below the counted cutoff the walk is ONE " +
      "window over the checkpointed cells, values identical") {
    val cells = cellDf(300, 8)
    val w = Window.orderBy(col("k").asc)
    // default cutoff (1 << 18) far above 300 rows -> small path
    val out = walk(cells, "k", asc = true, Seq(CumSum("c", "cum"),
      CumSum("d", "ds", inclusive = false)), buckets = 7, sampleTarget = 64)
    assertSame(out, cells.withColumn("cum", sum("c").over(w))
      .withColumn("ds", sum("d").over(w.rowsBetween(
        Window.unboundedPreceding, -1))))
    // plan shape: no bucket machinery — one window, over the
    // materialized (LogicalRDD) cell table, no join/aggregate above it
    val windows = out.queryExecution.optimizedPlan.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window => win
    }
    assert(windows.size == 1, s"expected one window, got ${windows.size}")
    assert(out.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, "small path must not join bucket offsets")
  }

  test("the cutoff conf flips the physical shape, never the values") {
    val cells = cellDf(64, 9)
    val small = walk(cells, "k", asc = true, Seq(CumSum("c", "cum")))
    val big = withCutoff(1) {
      walk(cells, "k", asc = true, Seq(CumSum("c", "cum")),
        buckets = 5, sampleTarget = 8)
    }
    assertSame(big, small)
  }

  test("the only unpartitioned window in the plan is the bucket-offset " +
      "walk over the totals table") { withCutoff(1) {
    val cells = cellDf(300, 6)
    val out = walk(cells, "k", asc = true, Seq(CumSum("c", "cum")),
      buckets = 7, sampleTarget = 64)
    // optimized LOGICAL plan: AQE stage boxes hide physical subtrees
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size == 1,
      s"expected exactly the offset window, got ${unpartitioned.size}")
    // the offset window's input is the GROUPED totals table (one row
    // per bucket), never the cell table itself
    assert(unpartitioned.head.child.find {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _ => false
    }.isDefined, "offset window must sit above the per-bucket aggregate")
    val partitioned = windows.filter(_.partitionSpec.nonEmpty)
    assert(partitioned.nonEmpty, "in-bucket walk must be a partitioned window")
  }}

  test("reserved column prefix and duplicate-spec misuse are rejected") {
    val cells = cellDf(10, 7)
    intercept[IllegalArgumentException] {
      walk(cells.withColumn("__cw_x", lit(1)), "k", asc = true,
        Seq(CumSum("c", "cum")))
    }
    intercept[IllegalArgumentException] {
      walk(cells, "k", asc = true,
        Seq(CumSum("c", "a"), CumMax("c", "b")))
    }
  }
}
