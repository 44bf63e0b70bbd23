package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class OlapSpec extends SparkTestBase {

  private lazy val sales = df("region STRING, product STRING, amount BIGINT", Seq(
    Row("east", "widget", 10L), Row("east", "widget", 20L),
    Row("east", "gadget", 5L), Row("west", "widget", 7L)))

  test("rollupAgg: per-level subtotals with grouping_id disambiguation") {
    val out = Olap.rollupAgg(sales, Seq("region", "product"),
      Seq(count(lit(1)).as("n"), sum("amount").as("total")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      ("east", "widget", 0L, 2L, 30L),
      ("east", "gadget", 0L, 1L, 5L),
      ("west", "widget", 0L, 1L, 7L),
      ("east", null, 1L, 3L, 35L),     // product aggregated out → gid bit 1
      ("west", null, 1L, 1L, 7L),
      (null, null, 3L, 4L, 42L)))      // grand total
  }

  test("cubeAgg adds the product-only slice rollup lacks") {
    val cube = Olap.cubeAgg(sales, Seq("region", "product"),
      Seq(count(lit(1)).as("n")))
    val productOnly = cube.where(col("gid") === 2L)
      .collect().map(r => (r.getString(1), r.getLong(3))).toSet
    assert(productOnly == Set(("widget", 3L), ("gadget", 1L)))
    assert(cube.count() == 6 + 2) // rollup levels + the (·, product) slice
  }

  test("rollup is one shuffle: grouping sets expand map-side, single exchange") {
    val plan = Olap.rollupAgg(sales, Seq("region", "product"),
      Seq(count(lit(1)).as("n"))).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Exchange".r.findAllMatchIn(plan).size == 1, plan)
  }

  test("cube is one shuffle too: 2^n grouping sets expand map-side") {
    val plan = Olap.cubeAgg(sales, Seq("region", "product"),
      Seq(count(lit(1)).as("n"))).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Exchange".r.findAllMatchIn(plan).size == 1, plan)
  }

  test("groupingSetsAgg: independent slices only — no cross product, no grand total") {
    val out = Olap.groupingSetsAgg(sales,
      Seq(Seq("region"), Seq("product")), Seq("region", "product"),
      Seq(count(lit(1)).as("n"), sum("amount").as("total")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(out == Set(
      ("east", null, 1L, 3L, 35L),     // region slice: status bit set
      ("west", null, 1L, 1L, 7L),
      (null, "widget", 2L, 3L, 37L),   // product slice: region bit set
      (null, "gadget", 2L, 1L, 5L)))
  }

  test("groupingSetsAgg is one shuffle: sets expand map-side like rollup") {
    val plan = Olap.groupingSetsAgg(sales,
      Seq(Seq("region"), Seq("product")), Seq("region", "product"),
      Seq(count(lit(1)).as("n"))).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Exchange".r.findAllMatchIn(plan).size == 1, plan)
  }

  test("unpivot melts value columns long, shuffle-free") {
    val wide = df("id BIGINT, a DOUBLE, b DOUBLE", Seq(
      Row(1L, 1.5, 2.5), Row(2L, 3.0, 4.0)))
    val long = Olap.unpivot(wide, Seq("id"), Seq("a", "b"))
    assert(long.columns.toSeq == Seq("id", "metric", "value"))
    val rows = long.orderBy("id", "metric").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "a", 1.5), (1L, "b", 2.5), (2L, "a", 3.0), (2L, "b", 4.0)))
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pivotCount: explicit domain, zero-filled cells, deterministic columns") {
    val wide = Olap.pivotCount(sales, "region", "product",
      Seq("widget", "gadget", "doohickey"))
    assert(wide.columns.toSeq == Seq("region", "widget", "gadget", "doohickey"))
    val byRegion = wide.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byRegion("east") == ((2L, 1L, 0L)))
    assert(byRegion("west") == ((1L, 0L, 0L))) // empty cells are 0, not null
  }

  test("abcClassification: previous-cum-share class boundaries") {
    // a 50, b 30, c 15, d 5 -> prev shares 0, .5, .8, .95 -> A A B C
    val d = df("k STRING, v DOUBLE", Seq(
      Row("a", 20.0), Row("a", 30.0), Row("b", 30.0),
      Row("c", 15.0), Row("d", 5.0), Row(null, 99.0)))
    val out = Olap.abcClassification(d, "k", "v").orderBy("cum_share")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3), r.getString(4))).toSeq
    assert(out == Seq(
      ("a", 50.0, 0.5, 0.5, "A"),
      ("b", 30.0, 0.3, 0.8, "A"),
      ("c", 15.0, 0.15, 0.95, "B"),
      ("d", 5.0, 0.05, 1.0, "C")))
  }

  test("abcClassification: value ties order by key") {
    val d = df("k STRING, v DOUBLE", Seq(Row("z", 1.0), Row("y", 1.0)))
    val out = Olap.abcClassification(d, "k", "v").orderBy("cum_share")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("y", "z"))
  }
}
