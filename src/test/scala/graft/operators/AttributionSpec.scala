package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class AttributionSpec extends SparkTestBase {

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val day = 86400000000L
  // u1: A@d1, B@d2, C@d3, conv@d4; u2: B@d1, conv@d2;
  // u3: A@d5, never converts; u4: conv@d1 with no touches
  private def journeys = df(
    "u BIGINT, t BIGINT, id BIGINT, ch STRING, c BOOLEAN", Seq(
      Row(1L, 1 * day, 10L, "A", false), Row(1L, 2 * day, 11L, "B", false),
      Row(1L, 3 * day, 12L, "C", false), Row(1L, 4 * day, 13L, "x", true),
      Row(2L, 1 * day, 20L, "B", false), Row(2L, 2 * day, 21L, "x", true),
      Row(3L, 5 * day, 30L, "A", false),
      Row(4L, 1 * day, 40L, "x", true)))

  private def run(model: String, decay: Double = 0.1) =
    Attribution.credit(journeys, "u", "t", "id", "ch", "c", model, decay)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq

  test("first/last: the whole unit lands on one touch") {
    assert(run("first") ==
      Seq(("A", 1.0, 1L), ("B", 1.0, 2L), ("C", 0.0, 1L)))
    assert(run("last") ==
      Seq(("A", 0.0, 1L), ("B", 1.0, 2L), ("C", 1.0, 1L)))
  }

  test("linear and position: per-journey credit sums to one") {
    val third = r9(1.0 / 3)
    assert(run("linear") == Seq(
      ("A", r6(third), 1L), ("B", r6(third + 1.0), 2L),
      ("C", r6(third), 1L)))
    // k=3 -> 0.4 / 0.2 / 0.4; k=1 -> 1.0
    assert(run("position") ==
      Seq(("A", 0.4, 1L), ("B", 1.2, 2L), ("C", 0.4, 1L)))
  }

  test("decay: recency-weighted credit, renormalized per journey") {
    // u1 deltas: 3, 2, 1 days -> w = exp(-0.1 * delta)
    val w = Seq(3.0, 2.0, 1.0).map(d => r9(math.exp(r9(-0.1 * d))))
    val wsum = w.map(BigDecimal(_)).sum.toDouble
    val c = w.map(x => r9(x / wsum))
    val got = run("decay")
    assert(got.map(_._1) == Seq("A", "B", "C"))
    assert(got(0)._2 == r6(c(0)))
    assert(got(1)._2 == r6(c(1) + 1.0)) // u2's single touch gets 1.0
    assert(got(2)._2 == r6(c(2)))
  }

  test("tie on the conversion timestamp breaks on the id column") {
    // touch at the SAME ts as conversion: smaller id counts, larger not
    val d = df("u BIGINT, t BIGINT, id BIGINT, ch STRING, c BOOLEAN", Seq(
      Row(1L, 5 * day, 1L, "A", false), Row(1L, 5 * day, 2L, "x", true),
      Row(2L, 5 * day, 9L, "A", false), Row(2L, 5 * day, 8L, "x", true)))
    val out = Attribution.credit(d, "u", "t", "id", "ch", "c", "first")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("A", 1.0))) // u1's A counted, u2's A excluded
  }

  test("unknown model is rejected") {
    intercept[IllegalArgumentException] {
      Attribution.credit(journeys, "u", "t", "id", "ch", "c", "shapley")
    }
  }

  test("markovRemoval: hand-solved absorbing chain") {
    // journeys: u1 = A->conv; u2 = A->B->A->conv; u3 = A->B (no conv)
    // chain: START->A 1.0; A: ->CONV 0.5, ->B 0.5; B: ->A 0.5, ->NULL 0.5
    // exact absorption: p(A) = 2/3. Remove A: p = 0 -> effect 1.
    // Remove B: p(A) = 0.5 -> effect 1 - (1/2)/(2/3) = 0.25.
    val d = df("u BIGINT, t BIGINT, id BIGINT, ch STRING, c BOOLEAN", Seq(
      Row(1L, 1 * day, 1L, "A", false), Row(1L, 2 * day, 2L, "x", true),
      Row(2L, 1 * day, 3L, "A", false), Row(2L, 2 * day, 4L, "B", false),
      Row(2L, 3 * day, 5L, "A", false), Row(2L, 4 * day, 6L, "x", true),
      Row(3L, 1 * day, 7L, "A", false), Row(3L, 2 * day, 8L, "B", false)))
    val out = Attribution
      .markovRemoval(d, "u", "t", "id", "ch", "c", iterations = 40)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) == Seq("A", "B"))
    assert(math.abs(out(0)._2 - 1.0) < 1e-6)
    assert(math.abs(out(1)._2 - 0.25) < 1e-6)
    // credits split 1 : 0.25 over 2 conversions -> 1.6 / 0.4
    assert(math.abs(out(0)._3 - 1.6) < 1e-5)
    assert(math.abs(out(1)._3 - 0.4) < 1e-5)
  }

  test("markovRemoval: touchless conversions dilute every channel") {
    // u1 converts through A; u2 converts with NO touches (START->CONV)
    val d = df("u BIGINT, t BIGINT, id BIGINT, ch STRING, c BOOLEAN", Seq(
      Row(1L, 1 * day, 1L, "A", false), Row(1L, 2 * day, 2L, "x", true),
      Row(2L, 1 * day, 3L, "x", true)))
    val out = Attribution
      .markovRemoval(d, "u", "t", "id", "ch", "c", iterations = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // p_full = 1; removing A keeps the direct START->CONV half
    assert(out.toSeq == Seq(("A", 0.5, 2.0)))
  }
}
