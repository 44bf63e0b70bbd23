package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class DriftSpec extends SparkTestBase {

  private def corpus(vals: String*) =
    df("lang STRING", vals.map(Row(_)))

  test("jsDivergence matches the hand formula; zero for identical, ln 2 for disjoint") {
    val a = corpus("x", "x", "y")
    val b = corpus("x", "z")
    val out = Drift.jsDivergence(a, b, "lang").head()
    // pa: x=2/3 y=1/3; pb: x=1/2 z=1/2
    def term(p: Double, m: Double) = if (p > 0) p * math.log(p / m) else 0.0
    val expect = Seq(
      (2.0 / 3, 1.0 / 2), (1.0 / 3, 0.0), (0.0, 1.0 / 2)).map { case (pa, pb) =>
      val m = (pa + pb) / 2
      BigDecimal(0.5 * term(pa, m) + 0.5 * term(pb, m))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
    assert(out.getLong(0) == 3L)
    assert(math.abs(out.getDouble(1) - expect) < 1e-6)
    assert(Drift.jsDivergence(a, a, "lang").head().getDouble(1) == 0.0)
    val disjoint = Drift.jsDivergence(corpus("p"), corpus("q"), "lang").head()
    assert(math.abs(disjoint.getDouble(1) - math.log(2)) < 1e-6)
  }

  test("psiTimeline: baseline days score ~0; the flipped day scores ln 3") {
    import java.sql.Timestamp
    // baseline (days 1-2): x:y = 3:1 each day; day 3 flips to 1:3
    def rows(day: Int, vals: Seq[String]) = vals.map(v =>
      Row(Timestamp.valueOf(f"2024-01-0$day 10:00:00"), v))
    val ev = df("ts TIMESTAMP, lang STRING",
      rows(1, Seq("x", "x", "x", "y")) ++ rows(2, Seq("x", "x", "x", "y")) ++
        rows(3, Seq("x", "y", "y", "y")))
    val out = Drift.psiTimeline(ev, "ts", "lang", baselineDays = 2)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSeq
    val ln3 = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Seq(("2024-01-01", 4L, 0.0), ("2024-01-02", 4L, 0.0),
      ("2024-01-03", 4L, ln3)))
  }

  test("psi: hand formula, epsilon floor for vanished levels, zero when identical") {
    // symmetric 3:1 flip -> psi = 0.5·ln 3 + 0.5·ln 3 = ln 3
    val a = corpus("x", "x", "x", "y")
    val b = corpus("x", "y", "y", "y")
    val r1 = Drift.psi(a, b, "lang").collect()(0)
    assert(r1.getLong(0) == 2L)
    assert(r1.getAs[Double]("psi") ==
      BigDecimal(math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // identical distributions -> 0
    assert(Drift.psi(a, a, "lang").collect()(0).getAs[Double]("psi") == 0.0)
    // a level that vanished contributes a large FINITE term via the floor
    val gone = Drift.psi(corpus("x", "x", "x", "x"),
      corpus("x", "x", "z", "z"), "lang").collect()(0)
    def t(pa: Double, pb: Double) = {
      val fa = math.max(pa, 1e-4); val fb = math.max(pb, 1e-4)
      BigDecimal((fa - fb) * math.log(fa / fb))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = (t(1.0, 0.5) + t(0.0, 0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gone.getAs[Double]("psi") == expected)
    assert(gone.getAs[Double]("psi") > 4.0) // firmly in the "act" band
  }

  test("numericJs bins with clamped edges and excludes NULLs") {
    val a = df("n BIGINT", Seq(1L, 5L, 15L, 25L, 999L).map(Row(_)))
    val b = df("n BIGINT", (Seq(1L, 5L, 15L, 25L, 999L) :+ null).map(Row(_)))
    // same non-null values (the NULL is excluded) → zero divergence
    assert(Drift.numericJs(a, b, "n", 0.0, 30.0, 3).head().getDouble(1) == 0.0)
    // out-of-range values clamp into the edge bins, not a crash or drop
    val c = df("n BIGINT", Seq(Row(-50L), Row(500L)))
    val r = Drift.numericJs(a, c, "n", 0.0, 30.0, 3).head()
    assert(r.getLong(0) == 3L && r.getDouble(1) > 0.0)
    intercept[IllegalArgumentException] {
      Drift.numericJs(a, b, "n", 10.0, 10.0, 3)
    }
  }

  test("categoricalDetail keeps one-sided and NULL levels") {
    val a = df("lang STRING", Seq(Row("x"), Row(null), Row(null)))
    val b = df("lang STRING", Seq(Row("x"), Row("y")))
    val rows = Drift.categoricalDetail(a, b, "lang")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(
      (Some("x"), 1L, 1L),
      (Some("y"), 0L, 1L),
      (None, 2L, 0L)))   // NULL level aligned on one row, not split
  }

  test("ksTest: hand ECDF gap, zero for identical, one for disjoint") {
    def nums(vs: Double*) = df("n DOUBLE", vs.map(Row(_)))
    // F_a over {1,2,3,4}: .25 .5 .75 1; F_b over {3,4,5}: 0 0 1/3 2/3 1
    // gaps: .25 .5 .416667 .333333 0 -> D = 0.5 at value 2
    val out = Drift.ksTest(nums(1, 2, 3, 4), nums(3, 4, 5), "n").head()
    assert(out.getLong(0) == 4L && out.getLong(1) == 3L)
    assert(out.getAs[Double]("ks") == 0.5)
    val same = nums(1, 2, 2, 9)
    assert(Drift.ksTest(same, same, "n").head().getAs[Double]("ks") == 0.0)
    assert(Drift.ksTest(nums(1, 2), nums(10, 11), "n")
      .head().getAs[Double]("ks") == 1.0)
    // NULLs excluded from both sides, not counted in n
    val withNull = df("n DOUBLE", Seq(Row(1.0), Row(null)))
    val r = Drift.ksTest(withNull, nums(1), "n").head()
    assert(r.getLong(0) == 1L && r.getAs[Double]("ks") == 0.0)
  }
}
