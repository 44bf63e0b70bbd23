package graft.pipeline

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.Row

class PipelineExecutorSpec extends SparkTestBase {

  private def freshExecutor() = {
    val ex = new PipelineExecutor(spark)
    ex.register("orders", df("order_id BIGINT, customer_id BIGINT, amount DOUBLE",
      Seq(Row(1L, 101L, 100.0), Row(2L, 101L, 300.0), Row(3L, 102L, 50.0))))
    ex.register("customers", df("customer_id BIGINT, name STRING",
      Seq(Row(101L, "Alice"), Row(102L, "Bob"))))
    ex
  }

  test("result tables are named result_stage_<n>_<type> with 1-based index") {
    val ex = freshExecutor()
    val rs = ex.execute(Seq(
      FilterStage("a", "", Some("orders"), Seq(FilterCondition("amount", ">", 60))),
      SortStage("b", "", None, Seq(SortKey("amount", "DESC")))))
    assert(rs.map(_.tableName) ==
      Seq("result_stage_1_filter", "result_stage_2_sort"))
    assert(ex.resultTableFor("a").contains("result_stage_1_filter"))
  }

  test("implicit chaining: unary stage with no table uses previous result") {
    val ex = freshExecutor()
    val out = ex.run(Seq(
      FilterStage("a", "", Some("orders"), Seq(FilterCondition("amount", ">", 60))),
      GroupStage("b", "", None, Seq("customer_id"),
        Seq(Aggregation("count", "*", Some("n"))))))
    assertSameRows(out, Seq(Seq(101L, 2L)))
  }

  test("explicit table reference beats chaining") {
    val ex = freshExecutor()
    val out = ex.run(Seq(
      FilterStage("a", "", Some("orders"), Seq(FilterCondition("amount", ">", 1000))),
      SelectStage("b", "", Some("customers"), Seq("name"))))
    assert(out.count() == 2) // reads customers, not the empty filter result
  }

  test("first loaded table is the default input when nothing chains") {
    val ex = freshExecutor()
    val out = ex.run(Seq(
      SelectStage("a", "", None, Seq("order_id"))))
    assert(out.count() == 3)
  }

  test("Abort policy stops at the first failing stage") {
    val ex = freshExecutor()
    val rs = ex.execute(Seq(
      FilterStage("a", "", Some("nope"), Seq(FilterCondition("x", "=", 1))),
      SelectStage("b", "", Some("orders"), Seq("order_id"))),
      ErrorPolicy.Abort)
    assert(rs.length == 1 && !rs.head.succeeded)
  }

  test("Continue policy logs and keeps going (image-import semantics)") {
    val ex = freshExecutor()
    val rs = ex.execute(Seq(
      FilterStage("a", "", Some("nope"), Seq(FilterCondition("x", "=", 1))),
      SelectStage("b", "", Some("orders"), Seq("order_id"))),
      ErrorPolicy.Continue)
    assert(rs.length == 2 && !rs(0).succeeded && rs(1).succeeded)
  }

  test("CUSTOM stages see prior results as temp views") {
    val ex = freshExecutor()
    val out = ex.run(Seq(
      FilterStage("a", "", Some("orders"), Seq(FilterCondition("amount", ">", 60))),
      CustomStage("b", "", "SELECT sum(amount) AS s FROM result_stage_1_filter")))
    assertSameRows(out, Seq(Seq(400.0)))
  }

  test("re-execution overwrites the result table in place") {
    val ex = freshExecutor()
    ex.run(Seq(FilterStage("a", "", Some("orders"),
      Seq(FilterCondition("amount", ">", 60)))))
    ex.run(Seq(FilterStage("a", "", Some("orders"),
      Seq(FilterCondition("amount", ">", 0)))))
    assert(ex.table("result_stage_1_filter").count() == 3)
  }

  test("describe renders DuckDB-style type names") {
    val ex = freshExecutor()
    assert(ex.describe("orders") == Seq(
      ("order_id", "BIGINT"), ("customer_id", "BIGINT"), ("amount", "DOUBLE")))
  }

  test("preview caps at 1000 rows") {
    val ex = new PipelineExecutor(spark)
    ex.register("big", spark.range(5000).toDF("id"))
    assert(ex.preview("big").length == 1000)
  }

  test("file and LLM table-name sanitization rules") {
    assert(PipelineExecutor.tableNameForFile("My Sales-2023.csv") == "table_My_Sales_2023")
    assert(PipelineExecutor.cleanTableName("orders_csv") == "orders")
    assert(PipelineExecutor.cleanTableName("Orders_XLSX") == "Orders")
    assert(PipelineExecutor.cleanTableName("plain") == "plain")
  }
}
