package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class RegressionSpec extends SparkTestBase {

  test("olsByGroup: exact-decimal fit, constant-y and constant-x guards") {
    // g: y = 2x + 1 exactly (slope 2, intercept 1, r2 1)
    // h: y constant   -> slope 0, intercept 5, r2 NULL
    // i: x constant   -> slope/intercept/r2 NULL
    val d = df("k STRING, x DOUBLE, y DOUBLE", Seq(
      Row("g", 0.0, 1.0), Row("g", 1.0, 3.0),
      Row("g", 2.0, 5.0), Row("g", 3.0, 7.0),
      Row("h", 1.0, 5.0), Row("h", 2.0, 5.0),
      Row("i", 1.0, 2.0), Row("i", 1.0, 3.0)))
    val out = Regression.olsByGroup(d, "k", "x", "y")
      .orderBy("key").collect()
    assert(out(0).getString(0) == "g" && out(0).getLong(1) == 4L)
    assert(out(0).getDouble(2) == 2.0)
    assert(out(0).getDouble(3) == 1.0)
    assert(out(0).getDouble(4) == 1.0)
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 5.0 &&
      out(1).isNullAt(4))
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(4))
  }

  test("olsByGroup: NULL x or y rows drop from their group") {
    val d = df("k STRING, x DOUBLE, y DOUBLE", Seq(
      Row("g", 0.0, 0.0), Row("g", 2.0, 4.0),
      Row("g", null, 9.0), Row("g", 9.0, null)))
    val out = Regression.olsByGroup(d, "k", "x", "y").head()
    assert(out.getLong(1) == 2L && out.getDouble(2) == 2.0)
  }
}
