package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LineageSpec extends SparkTestBase {

  private lazy val load = graft.sources.Ingest.loadDir(
    spark, "/root/testdata/sf0.001", Seq("orders", "customer", "documents"))

  test("join + aggregate: outputs trace through the join to their source tables") {
    load
    val df = spark.sql(
      """SELECT c_name, sum(o_totalprice) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name""".stripMargin)
    val m = Lineage.columnLineage(df)
    assert(m("c_name") == Seq("customer.c_name"))
    assert(m("rev") == Seq("orders.o_totalprice"))
  }

  test("expressions union their inputs; literals have empty lineage") {
    load
    val df = spark.table("customer")
      .select((col("c_acctbal") * col("c_custkey")).as("mix"),
        lit(1).as("one"))
    val m = Lineage.columnLineage(df)
    assert(m("mix") == Seq("customer.c_acctbal", "customer.c_custkey"))
    assert(m("one") == Seq())
  }

  test("union merges positionally; explode traces to the generator input") {
    load
    val a = spark.table("orders").select(col("o_orderkey").as("k"))
    val b = spark.table("customer").select(col("c_custkey").as("k"))
    val m = Lineage.columnLineage(a.unionByName(b))
    assert(m("k") == Seq("customer.c_custkey", "orders.o_orderkey"))

    val ex = spark.table("documents")
      .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
    val me = Lineage.columnLineage(ex)
    assert(me("line") == Seq("documents.text"))
    assert(me("doc_id") == Seq("documents.doc_id"))
  }

  test("self-join keeps both sides' qualifiers distinct through re-aliasing") {
    load
    val df = spark.sql(
      """SELECT l.o_totalprice AS lp, r.o_totalprice AS rp
        |FROM orders l JOIN orders r ON l.o_orderkey = r.o_custkey""".stripMargin)
    val m = Lineage.columnLineage(df)
    // each side resolves through its own alias chain (innermost-first
    // qualification: the l/r aliases sit above the orders view, so the
    // view name qualifies first — both sides report orders.o_totalprice)
    assert(m("lp") == Seq("orders.o_totalprice"))
    assert(m("rp") == Seq("orders.o_totalprice"))
  }

  test("a compiled stage pipeline reports lineage end-to-end") {
    load
    val df = spark.table("orders")
      .join(spark.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
    val m = Lineage.columnLineage(df)
    assert(m("c_mktsegment") == Seq("customer.c_mktsegment"))
    assert(m("rev") == Seq("orders.o_totalprice"))
  }
}
