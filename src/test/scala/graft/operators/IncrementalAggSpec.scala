package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IncrementalAggSpec extends SparkTestBase {

  private lazy val t = df("k STRING, v DOUBLE", Seq(
    Row("a", 1.10), Row("a", 2.20), Row("b", 5.00),
    Row("b", null), Row("c", -3.30), Row("a", 0.70)))

  private def finished(rows: Array[Row]) =
    rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq

  test("merge of per-batch states equals the one-shot state") {
    val b1 = IncrementalAgg.state(t.limit(3), Seq("k"), "v")
    val b2 = IncrementalAgg.state(t.except(t.limit(3)), Seq("k"), "v")
    val merged = IncrementalAgg.finish(
      IncrementalAgg.merge(Seq("k"), b1, b2), Seq("k")).orderBy("k")
    val direct = IncrementalAgg.finish(
      IncrementalAgg.state(t, Seq("k"), "v"), Seq("k")).orderBy("k")
    assert(merged.collect().toSeq == direct.collect().toSeq)
  }

  test("merge is argument-order independent") {
    val b1 = IncrementalAgg.state(t.filter(col("v") > 1), Seq("k"), "v")
    val b2 = IncrementalAgg.state(t.filter(col("v") <= 1 || col("v").isNull),
      Seq("k"), "v")
    val ab = IncrementalAgg.merge(Seq("k"), b1, b2).orderBy("k").collect()
    val ba = IncrementalAgg.merge(Seq("k"), b2, b1).orderBy("k").collect()
    assert(ab.toSeq == ba.toSeq)
  }

  test("finish derives avg from state; all-NULL group yields n=0, null metrics") {
    val g = df("k STRING, v DOUBLE", Seq(Row("x", null), Row("x", null)))
    val out = IncrementalAgg.finish(
      IncrementalAgg.state(g, Seq("k"), "v"), Seq("k")).head()
    assert(out.getLong(1) == 0L)     // n counts non-null values only
    assert(out.isNullAt(2) && out.isNullAt(5)) // total and avg are NULL
  }

  test("retract removes deleted rows exactly and drops emptied keys") {
    val base = IncrementalAgg.state(t, Seq("k"), "v")
    // delete all of c and one a-row: c must vanish, a must shrink
    val deletes = t.filter(col("k") === "c" ||
      (col("k") === "a" && col("v") === 2.20))
    val out = IncrementalAgg.retract(base, deletes, Seq("k"), "v")
      .select(col("k"), col("n"), col("sum_dec").cast("double").as("total"))
      .orderBy("k")
    val direct = IncrementalAgg.state(t.except(deletes), Seq("k"), "v")
      .select(col("k"), col("n"), col("sum_dec").cast("double").as("total"))
      .orderBy("k")
    assert(finished(out.collect()) == finished(direct.collect()))
    assert(!out.columns.contains("min_v")) // non-invertible metrics dropped
  }
}
