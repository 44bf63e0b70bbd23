package graft.model

import org.scalatest.funsuite.AnyFunSuite

class StageJsonSpec extends AnyFunSuite {

  test("parses the reference's sampleStages.json interchange format") {
    // Same shape as ui/src/sampleStages.json (field-for-field).
    val json =
      """[{"id": "sample_join_customers_orders", "type": "JOIN",
        |  "description": "Join customers and orders tables on customer_id",
        |  "data": {"joinType": "INNER", "leftTable": "orders",
        |           "rightTable": "customers",
        |           "leftKey": "customer_id", "rightKey": "customer_id"}}]""".stripMargin
    val stages = StageJson.parseStages(json)
    assert(stages == Seq(JoinStage("sample_join_customers_orders",
      "Join customers and orders tables on customer_id",
      "INNER", "orders", "customers", "customer_id", "customer_id")))
  }

  test("round-trips every stage type") {
    val stages: Seq[Stage] = Seq(
      LoadStage("stage_1", "load", "table_orders", "orders.csv"),
      JoinStage("stage_2", "join", "LEFT", "a", "b", "k1", "k2"),
      UnionStage("stage_3", "union", "UNION ALL", Seq("a", "b", "c")),
      FilterStage("stage_4", "single", Some("t"),
        Seq(FilterCondition("amount", ">", "100"))),
      FilterStage("stage_5", "multi", None, Seq(
        FilterCondition("a", "=", 1L),
        FilterCondition("b", "LIKE", "%x%", Some("OR")))),
      GroupStage("stage_6", "group", Some("t"), Seq("g1", "g2"),
        Seq(Aggregation("SUM", "amount", Some("total")),
          Aggregation("COUNT", "*", None))),
      SelectStage("stage_7", "select", None, Seq("a", "b")),
      SortStage("stage_8", "sort", Some("t"),
        Seq(SortKey("a", "DESC"), SortKey("b"))),
      AggregateStage("stage_9", "agg", None, Seq(Aggregation("AVG", "x", Some("m")))),
      CustomStage("stage_10", "custom", "SELECT 1 AS one"))
    assert(StageJson.parseStages(StageJson.render(stages)) == stages)
  }

  test("single-condition FILTER renders flat column/operator/value fields") {
    val s = FilterStage("s", "", Some("t"), Seq(FilterCondition("c", "=", "v")))
    val json = StageJson.render(Seq(s))
    assert(json.contains(""""column":"c""""))
    assert(!json.contains("conditions"))
  }

  test("unsupported stage type throws (sqlGenerator.ts:121-123 parity)") {
    val err = intercept[IllegalArgumentException] {
      StageJson.parseStages("""[{"id":"x","type":"PIVOT","description":"","data":{}}]""")
    }
    assert(err.getMessage.contains("PIVOT"))
  }

  test("missing required fields throw with the field name") {
    val err = intercept[IllegalArgumentException] {
      StageJson.parseStages(
        """[{"id":"x","type":"JOIN","description":"","data":{"leftTable":"a"}}]""")
    }
    assert(err.getMessage.contains("rightTable"))
  }

  test("numeric and array filter values keep their JSON type") {
    val stages = StageJson.parseStages(
      """[{"id":"x","type":"FILTER","description":"","data":
        |{"column":"k","operator":"IN","value":[1, 2, 3]}}]""".stripMargin)
    val FilterStage(_, _, _, Seq(c)) = stages.head: @unchecked
    assert(c.value == Seq(1L, 2L, 3L))
  }
}
