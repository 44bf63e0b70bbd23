package graft.compile

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.Row

/** Semantics tests for the stage → DataFrame compiler, pinned to the
  * reference's observable behavior (ui/src/sqlGenerator.ts:6-124). */
class StageCompilerSpec extends SparkTestBase {

  private lazy val orders = df(
    "order_id BIGINT, customer_id BIGINT, amount DOUBLE",
    Seq(Row(5001L, 101L, 1200.5), Row(5002L, 103L, 45.0),
      Row(5003L, 101L, 150.0), Row(5004L, 999L, 10.0)))

  private lazy val customers = df(
    "customer_id BIGINT, name STRING",
    Seq(Row(101L, "Alice"), Row(103L, "Charlie"), Row(104L, "Diana")))

  private def lookup(m: Map[String, org.apache.spark.sql.DataFrame])(n: String) =
    m.getOrElse(n, fail(s"unknown table $n"))

  private def compile(stage: Stage) =
    StageCompiler.compile(spark, stage,
      lookup(Map("orders" -> orders, "customers" -> customers)))

  test("same-key inner join dedups key column, orders cols first") {
    val out = compile(JoinStage("s1", "", "INNER", "orders", "customers",
      "customer_id", "customer_id"))
    assert(out.columns.toSeq ==
      Seq("order_id", "customer_id", "amount", "name"))
    assertSameRows(out, Seq(
      Seq(5001L, 101L, 1200.5, "Alice"),
      Seq(5002L, 103L, 45.0, "Charlie"),
      Seq(5003L, 101L, 150.0, "Alice")))
  }

  test("same-key FULL OUTER join keeps the LEFT key (no coalesce), like DuckDB l.*") {
    val out = compile(JoinStage("s1", "", "FULL OUTER", "orders", "customers",
      "customer_id", "customer_id"))
    // Diana (104) matches no order: left-side key is NULL in that row.
    val diana = out.collect().filter(r => r.getAs[String]("name") == "Diana")
    assert(diana.length == 1 && diana.head.isNullAt(out.columns.indexOf("customer_id")))
    // order 5004 (999) matches no customer: name NULL, key kept.
    val unmatched = out.collect().filter(r => !r.isNullAt(0) && r.getLong(0) == 5004L)
    assert(unmatched.head.getAs[Long]("customer_id") == 999L)
    assert(out.count() == 5) // 3 matches + 1 left-only + 1 right-only
  }

  test("different-key join keeps both key columns") {
    val o2 = orders.withColumnRenamed("customer_id", "cust")
    val out = StageCompiler.compile(spark,
      JoinStage("s1", "", "LEFT", "o", "customers", "cust", "customer_id"),
      Map("o" -> o2, "customers" -> customers))
    assert(out.columns.toSeq ==
      Seq("order_id", "cust", "amount", "customer_id", "name"))
    assert(out.count() == 4)
  }

  test("UNION dedups, UNION ALL keeps duplicates (positional)") {
    val a = df("x INT", Seq(Row(1), Row(2), Row(2)))
    val b = df("x INT", Seq(Row(2), Row(3)))
    val m = Map("a" -> a, "b" -> b)
    val u = StageCompiler.compile(spark, UnionStage("s", "", "UNION", Seq("a", "b")), m)
    val ua = StageCompiler.compile(spark, UnionStage("s", "", "UNION ALL", Seq("a", "b")), m)
    assertSameRows(u, Seq(Seq(1), Seq(2), Seq(3)))
    assert(ua.count() == 5)
  }

  test("filter fold honours SQL precedence: AND binds tighter than OR") {
    val t = df("a INT, b INT",
      Seq(Row(1, 10), Row(1, 99), Row(2, 10), Row(2, 99), Row(3, 50)))
    // a = 1 AND b > 50 OR a = 2 AND b < 50  →  (1,99), (2,10)
    val out = StageCompiler.compile(spark,
      FilterStage("s", "", Some("t"), Seq(
        FilterCondition("a", "=", 1),
        FilterCondition("b", ">", 50, Some("AND")),
        FilterCondition("a", "=", 2, Some("OR")),
        FilterCondition("b", "<", 50, Some("AND")))),
      Map("t" -> t))
    assertSameRows(out, Seq(Seq(1, 99), Seq(2, 10)))
  }

  test("string filter values coerce against numeric columns (DuckDB parity)") {
    val out = compile(FilterStage("s", "", Some("orders"),
      Seq(FilterCondition("amount", ">", "100"))))
    assertSameRows(out.select("order_id"), Seq(Seq(5001L), Seq(5003L)))
  }

  test("IN / NOT IN accept both list strings and Seq values") {
    val stringy = compile(FilterStage("s", "", Some("orders"),
      Seq(FilterCondition("customer_id", "IN", "(101, 103)"))))
    assert(stringy.count() == 3)
    val seqy = compile(FilterStage("s", "", Some("orders"),
      Seq(FilterCondition("customer_id", "NOT IN", Seq(101, 103)))))
    assertSameRows(seqy.select("order_id"), Seq(Seq(5004L)))
  }

  test("quoted IN list with '' escaping") {
    assert(StageCompiler.splitList("('it''s', 'b,c', 'd')") == Seq("it's", "b,c", "d"))
    assert(StageCompiler.splitList("1, 2, 3") == Seq("1", "2", "3"))
  }

  test("LIKE filter") {
    val out = compile(FilterStage("s", "", Some("customers"),
      Seq(FilterCondition("name", "LIKE", "%li%"))))
    assertSameRows(out.select("name"), Seq(Seq("Alice"), Seq("Charlie")))
  }

  test("GROUP projects group columns first, then aggregates") {
    val out = compile(GroupStage("s", "", Some("orders"),
      Seq("customer_id"), Seq(
        Aggregation("count", "*", Some("n")),
        Aggregation("sum", "amount", Some("total")))))
    assert(out.columns.toSeq == Seq("customer_id", "n", "total"))
    assertSameRows(out, Seq(
      Seq[Any](101L, 2L, 1350.5), Seq[Any](103L, 1L, 45.0), Seq[Any](999L, 1L, 10.0)))
  }

  test("global AGGREGATE without grouping") {
    val out = compile(AggregateStage("s", "", Some("orders"), Seq(
      Aggregation("count", "*", Some("n")),
      Aggregation("max", "amount", Some("biggest")))))
    assertSameRows(out, Seq(Seq[Any](4L, 1200.5)))
  }

  test("SELECT passes expressions through verbatim") {
    val out = compile(SelectStage("s", "", Some("orders"),
      Seq("order_id", "amount * 2 AS double_amount")))
    assert(out.columns.toSeq == Seq("order_id", "double_amount"))
  }

  test("SORT is order-sensitive with DuckDB NULLS LAST default") {
    val t = df("x INT, y INT", Seq(Row(1, 1), Row(null, 2), Row(3, 3)))
    val asc = StageCompiler.compile(spark,
      SortStage("s", "", Some("t"), Seq(SortKey("x", "ASC"))), Map("t" -> t))
    assertRowsInOrder(asc.select("y"), Seq(Seq(1), Seq(3), Seq(2)))
    val desc = StageCompiler.compile(spark,
      SortStage("s", "", Some("t"), Seq(SortKey("x", "DESC"))), Map("t" -> t))
    assertRowsInOrder(desc.select("y"), Seq(Seq(3), Seq(1), Seq(2)))
  }

  test("CUSTOM rewrites DuckDB EXCLUDE to Spark EXCEPT (sqlGenerator.ts:21 shape)") {
    orders.createOrReplaceTempView("orders_x")
    customers.createOrReplaceTempView("customers_x")
    val out = StageCompiler.compile(spark,
      CustomStage("s", "",
        "SELECT l.*, r.* EXCLUDE (customer_id) FROM orders_x l " +
          "JOIN customers_x r ON l.customer_id = r.customer_id"),
      Map.empty[String, org.apache.spark.sql.DataFrame])
    assert(out.columns.toSeq == Seq("order_id", "customer_id", "amount", "name"))
    assert(out.count() == 3)
  }

  test("EXCLUDE rewrite is quote-aware: literals and quoted identifiers survive") {
    // Outside quotes → rewritten (any case, any spacing).
    assert(StageCompiler.rewriteDuckSql("SELECT * exclude  (a) FROM t") ==
      "SELECT * EXCEPT (a) FROM t")
    // Inside a single-quoted constant (with '' escape) → untouched.
    assert(StageCompiler.rewriteDuckSql(
      "SELECT * FROM t WHERE note = 'don''t EXCLUDE (x)'") ==
      "SELECT * FROM t WHERE note = 'don''t EXCLUDE (x)'")
    // Inside a double-quoted identifier → untouched.
    assert(StageCompiler.rewriteDuckSql(
      "SELECT \"EXCLUDE (weird)\" FROM t") == "SELECT \"EXCLUDE (weird)\" FROM t")
    // Part of a longer identifier → untouched.
    assert(StageCompiler.rewriteDuckSql("SELECT my_EXCLUDE (a) FROM t") ==
      "SELECT my_EXCLUDE (a) FROM t")
    // Mixed: literal preserved, real EXCLUDE rewritten.
    assert(StageCompiler.rewriteDuckSql(
      "SELECT * EXCLUDE (k) FROM t WHERE c = 'EXCLUDE (k)'") ==
      "SELECT * EXCEPT (k) FROM t WHERE c = 'EXCLUDE (k)'")
  }

  test("CUSTOM runs raw SQL against registered temp views") {
    orders.createOrReplaceTempView("orders_v")
    val out = StageCompiler.compile(spark,
      CustomStage("s", "", "SELECT count(*) AS n FROM orders_v WHERE amount > 100"),
      Map.empty[String, org.apache.spark.sql.DataFrame])
    assertSameRows(out, Seq(Seq(2L)))
  }

  private implicit def mapAsLookup(
      m: Map[String, org.apache.spark.sql.DataFrame]): StageCompiler.TableLookup =
    n => m.getOrElse(n, throw new NoSuchElementException(n))
}
