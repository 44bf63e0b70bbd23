package graft.planner

import graft.SparkTestBase
import graft.model.JoinStage
import graft.pipeline.PipelineExecutor
import org.apache.spark.sql.Row

class PlannerSpec extends SparkTestBase {

  private val schemas = Seq(
    TableSchema("orders", Seq("order_id" -> "BIGINT", "customer_id" -> "BIGINT",
      "amount" -> "DOUBLE")),
    TableSchema("customers", Seq("customer_id" -> "BIGINT", "name" -> "VARCHAR")))

  test("join prompt plans a join over the shared key and decompiles to stages") {
    val plan = new MockPlanner().plan("join the two tables", schemas)
    assert(plan.isValid)
    assert(plan.sql ==
      "SELECT * FROM orders l JOIN customers r ON l.customer_id = r.customer_id")
    assert(plan.stages.collectFirst { case j: JoinStage => j.leftKey }
      .contains("customer_id"))
  }

  test("unplannable prompt is flagged invalid, like the reference's isValid gate") {
    val plan = new MockPlanner().plan("make me a sandwich", Seq.empty)
    assert(!plan.isValid && plan.stages.isEmpty)
  }

  test("planned SQL executes end-to-end through the pipeline (CUSTOM path)") {
    val ex = new PipelineExecutor(spark)
    ex.register("orders", df("order_id BIGINT, customer_id BIGINT, amount DOUBLE",
      Seq(Row(1L, 101L, 100.0), Row(2L, 102L, 50.0))))
    ex.register("customers", df("customer_id BIGINT, name STRING",
      Seq(Row(101L, "Alice"), Row(102L, "Bob"))))
    val plan = new MockPlanner().plan("join orders with customers", schemas)
    val out = spark.sql(plan.sql)
    assert(out.count() == 2)
    assert(out.columns.count(_ == "customer_id") == 2) // ON-join keeps both keys
  }
}
