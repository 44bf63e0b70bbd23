package graft.sql

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class SqlStageParserSpec extends AnyFunSuite {

  test("join + group + sort + filter decompose into stages in fixed order") {
    val sql = "SELECT c.name, SUM(o.amount) AS total FROM orders o " +
      "JOIN customers c ON o.customer_id = c.customer_id " +
      "WHERE amount > 100 GROUP BY c.name ORDER BY total DESC"
    val stages = SqlStageParser.parse(sql)
    assert(stages.map(_.stageType) == Seq("JOIN", "GROUP", "SORT", "FILTER"))
    val j = stages.head.asInstanceOf[JoinStage]
    assert(j.joinType == "INNER" && j.leftTable == "orders" &&
      j.rightTable == "customers" && j.leftKey == "customer_id")
    val g = stages(1).asInstanceOf[GroupStage]
    assert(g.groupBy == Seq("c.name"))
    assert(g.aggregations == Seq(Aggregation("SUM", "o.amount", Some("total"))))
    val s = stages(2).asInstanceOf[SortStage]
    assert(s.orderBy == Seq(SortKey("total", "DESC")))
    val f = stages(3).asInstanceOf[FilterStage]
    assert(f.conditions == Seq(FilterCondition("amount", ">", "100")))
  }

  test("LEFT JOIN type detected from statement text") {
    val stages = SqlStageParser.parse(
      "SELECT * FROM a x LEFT JOIN b y ON x.k = y.k")
    assert(stages.head.asInstanceOf[JoinStage].joinType == "LEFT")
  }

  test("UNION captures all FROM tables and ALL variant") {
    val stages = SqlStageParser.parse(
      "SELECT * FROM t1 UNION ALL SELECT * FROM t2")
    val u = stages.collectFirst { case u: UnionStage => u }.get
    assert(u.unionType == "UNION ALL" && u.tables == Seq("t1", "t2"))
  }

  test("plain projection becomes SELECT; star does not") {
    val sel = SqlStageParser.parse("SELECT a, b AS bb FROM t")
    assert(sel == Seq(SelectStage("parsed_stage_1",
      "Select columns: a, b", None, Seq("a", "b"))))
    val star = SqlStageParser.parse("SELECT * FROM t")
    assert(star.head.isInstanceOf[CustomStage]) // nothing matched → CUSTOM
  }

  test("group columns containing o/r/d/e letters still parse (reference regex bug fixed)") {
    val stages = SqlStageParser.parse(
      "SELECT order_date, COUNT(*) AS n FROM orders GROUP BY order_date")
    val g = stages.collectFirst { case g: GroupStage => g }.get
    assert(g.groupBy == Seq("order_date"))
  }

  test("unparseable SQL falls back to a single CUSTOM stage with explanation") {
    val stages = SqlStageParser.parse("WITH x AS (SELECT 1) SELECT * FROM x", "cte query")
    assert(stages == Seq(CustomStage("parsed_stage_1", "cte query",
      "WITH x AS (SELECT 1) SELECT * FROM x")))
  }

  test("prompt generator round-trips stage semantics into NL") {
    val stages = Seq(
      JoinStage("1", "", "LEFT", "orders", "customers", "cid", "cid"),
      FilterStage("2", "", Some("orders"), Seq(FilterCondition("amount", ">", "100"))),
      GroupStage("3", "", None, Seq("region"), Seq(Aggregation("SUM", "amount", Some("total")))))
    val prompt = PromptGenerator.fromStages(stages)
    assert(prompt ==
      "Perform a LEFT JOIN between orders and customers on orders.cid = customers.cid. " +
        "Filter orders where amount > 100. Group by region with SUM(amount) as total.")
  }

  test("prompt generator drops invalid stages (FILTER without table)") {
    val p = PromptGenerator.fromStages(Seq(
      FilterStage("1", "", None, Seq(FilterCondition("a", "=", "b")))))
    assert(p == "")
  }
}
