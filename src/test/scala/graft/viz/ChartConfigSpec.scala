package graft.viz

import graft.SparkTestBase
import org.apache.spark.sql.Row

class ChartConfigSpec extends SparkTestBase {

  private lazy val data = df("month STRING, sales DOUBLE, customers BIGINT",
    Seq(Row("Jan", 100.0, 5L), Row("Feb", 200.0, 7L)))

  test("numeric columns from schema; numeric-looking strings only with a sample row") {
    assert(ChartConfig.numericColumns(data) == Seq("sales", "customers"))
    val stringy = df("id STRING, label STRING", Seq(Row("42", "abc")))
    assert(ChartConfig.numericColumns(stringy) == Seq.empty)
    assert(ChartConfig.numericColumns(stringy, Some(stringy.head())) == Seq("id"))
  }

  test("suggest: x = first column, y = first numeric, z only for 3d") {
    assert(ChartConfig.suggest(data).contains(ChartConfig("bar", "month", "sales")))
    assert(ChartConfig.suggest(data, "3d-scatter").contains(
      ChartConfig("3d-scatter", "month", "sales", Some("customers"))))
  }

  test("validate rejects unknown types and missing columns with the reference's message") {
    assert(ChartConfig.validate(data, ChartConfig("pie", "month", "sales")).isLeft)
    val bad = ChartConfig.validate(data, ChartConfig("bar", "nope", "sales"))
    assert(bad == Left("""Column "nope" not found in data"""))
    assert(ChartConfig.validate(data, ChartConfig("line", "month", "sales")).isRight)
  }

  test("no numeric columns → no suggestion") {
    val stringy = df("a STRING", Seq(Row("x")))
    assert(ChartConfig.suggest(stringy).isEmpty)
  }
}
