package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class LinkageSpec extends SparkTestBase {

  // Two true duplicates (1,2): same city block, same zip, same name
  // initial; 3 shares the block with them but agrees on nothing else;
  // 4/5 live in another block and agree only on zip.
  private lazy val people = df(
    "id BIGINT, city STRING, zip STRING, initial STRING, active BOOLEAN", Seq(
      Row(1L, "springfield", "11111", "A", true),
      Row(2L, "springfield", "11111", "A", true),
      Row(3L, "springfield", "99999", "Z", false),
      Row(4L, "shelbyville", "22222", "B", true),
      Row(5L, "shelbyville", "22222", "C", false)))

  private val fields = Seq(
    Linkage.FieldSpec("zip", "zip", 0.9, 0.1),       // ±3.1699 / -3.1699
    Linkage.FieldSpec("initial", "initial", 0.8, 0.04),
    Linkage.FieldSpec("active", "active", 0.9, 0.5))

  test("scores: full agreement ranks above partial, above none") {
    val out = Linkage.linkageScores(people, people, "id", "id",
      "city", "city", fields, selfPairs = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    // blocks: springfield {1,2,3} -> 3 pairs; shelbyville {4,5} -> 1
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
    val w = fields.map(f => (f.agreeWeight, f.disagreeWeight))
    def round6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((1L, 2L)) == ((3, round6(w.map(_._1).sum))))
    assert(out((1L, 3L)) == ((0, round6(w.map(_._2).sum))))
    assert(out((4L, 5L))._1 == 1) // zip agrees only
    assert(out((1L, 2L))._2 > out((4L, 5L))._2)
    assert(out((4L, 5L))._2 > out((1L, 3L))._2)
  }

  test("matches: threshold keeps only the true duplicate pair") {
    val out = Linkage.linkageMatches(people, people, "id", "id",
      "city", "city", fields, threshold = 5.0, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("cross-table linkage keeps all block pairs (no id guard)") {
    val out = Linkage.linkageScores(people, people, "id", "id",
      "city", "city", fields, selfPairs = false)
    // 3x3 + 2x2 ordered pairs, including self-matches
    assert(out.count() == 13)
  }

  test("field agreement rates match hand counts over blocked pairs") {
    val out = Linkage.fieldAgreementRates(people, people, "id", "id",
      "city", "city", fields, selfPairs = true)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2)))).toMap
    // 4 pairs; zip agrees on (1,2) and (4,5); initial only (1,2); active (1,2)
    assert(out(0) == ((4L, 2L)))
    assert(out(1) == ((4L, 1L)))
    assert(out(2) == ((4L, 1L)))
  }

  test("FieldSpec rejects degenerate probabilities") {
    intercept[IllegalArgumentException] {
      Linkage.FieldSpec("a", "a", 0.2, 0.9) // m < u
    }
  }

  test("goldenRecord: longest / mode / latest rules with documented tie-breaks") {
    val d = df("cl INT, name STRING, seg STRING, bal DOUBLE, ver INT", Seq(
      Row(1, "ab", "A", 10.0, 1),
      Row(1, "xyz", "B", 20.0, 3),
      Row(1, "pqr", "B", 15.0, 2),
      Row(2, "qq", "C", 1.0, 7),
      Row(2, null, null, null, 8)))
    val g = Linkage.goldenRecord(d, "cl",
        longest = Seq("name"), mostFrequent = Seq("seg"),
        latest = Seq("bal" -> "ver"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getString(2), r.getString(4), r.getDouble(3))))
      .toMap
    // cluster 1: longest name ties ("xyz" vs "pqr", both 3) → greatest
    // = xyz; mode seg = B (2 votes); latest bal by ver=3 → 20.0
    assert(g(1) == ((3L, "xyz", "B", 20.0)))
    // cluster 2: null row contributes nothing; survivors from the
    // non-null member even though the NULL row is latest by ver
    assert(g(2) == ((2L, "qq", "C", 1.0)))
  }

  test("blockAudit: per-block sizes and exact pair volume, largest first") {
    val out = Linkage.blockAudit(people, people, "city", "city",
      selfPairs = true).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    // springfield: 3 rows -> 3 unordered pairs; shelbyville: 2 -> 1
    assert(out.toSeq == Seq(
      ("springfield", (3L, 3L, 3L)), ("shelbyville", (2L, 2L, 1L))))
    // cross-table (no self guard): pair volume is n_left * n_right
    val cross = Linkage.blockAudit(people, people.filter("id <= 2"),
      "city", "city").collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(cross("springfield") == 6L && cross("shelbyville") == 0L)
  }

  test("maxBlockSize drops over-cap blocks from scoring entirely") {
    val out = Linkage.linkageScores(people, people, "id", "id",
      "city", "city", fields, selfPairs = true, maxBlockSize = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // springfield (3 rows) is over the cap -> only shelbyville's pair
    assert(out.toSeq == Seq((4L, 5L)))
    // a cap above every block is a no-op
    val all = Linkage.linkageScores(people, people, "id", "id",
      "city", "city", fields, selfPairs = true, maxBlockSize = Some(10L))
    assert(all.count() == 4)
  }

  test("emEstimate: one EM round matches the hand-run on pattern counts") {
    // patterns over the 4 blocked pairs: (1,1,1) x1, (0,0,0) x2, (1,0,0) x1
    val out = Linkage.emEstimate(people, people, "id", "id",
      "city", "city", fields, lambda = 0.5, iterations = 1,
      selfPairs = true)
      .collect().map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // hand EM: p(111)=.324/.325, p(000)=.001/.217, p(100)=.009/.033
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-3
    assert(close(out(0)._3, 0.319717)) // lambda' = sum(p)/4
    assert(close(out(0)._1, 0.992793) && close(out(0)._2, 0.268399))
    assert(close(out(1)._1, 0.779530) && close(out(1)._2, 0.001131))
    assert(out(2)._1 == out(1)._1 && out(2)._2 == out(1)._2) // same pattern
    // every field stays identified: m above u after the update
    (0 to 2).foreach(f => assert(out(f)._1 > out(f)._2))
  }

  test("emEstimate: a second iteration sharpens toward the true partition") {
    val one = Linkage.emEstimate(people, people, "id", "id",
      "city", "city", fields, lambda = 0.5, iterations = 1,
      selfPairs = true).collect().map(r => r.getDouble(3)).head
    val two = Linkage.emEstimate(people, people, "id", "id",
      "city", "city", fields, lambda = 0.5, iterations = 2,
      selfPairs = true)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    // weights remain probabilities and stay identified
    two.foreach { case (_, m, u, lam) =>
      assert(m > 0 && m < 1 && u > 0 && u < 1 && m > u)
      assert(lam > 0 && lam < 1 && lam != one) // the fit moved
    }
  }

  test("goldenRecord: mode count ties break to the smallest value") {
    val d = df("cl INT, seg STRING", Seq(
      Row(1, "B"), Row(1, "A"), Row(1, "C"), Row(1, "A"), Row(1, "B")))
    val g = Linkage.goldenRecord(d, "cl", mostFrequent = Seq("seg"))
      .collect()(0)
    assert(g.getString(2) == "A") // A and B both have 2 → smallest
  }

  // person 6 shares zip (not city) with the true dups 1/2 — the pair a
  // city-only block key can never recover
  private lazy val peoplePlus = people.unionByName(df(
    "id BIGINT, city STRING, zip STRING, initial STRING, active BOOLEAN",
    Seq(Row(6L, "capital", "11111", "A", true))))

  test("linkageScoresMulti: a second pass recovers cross-block matches") {
    val single = Linkage.linkageScores(peoplePlus, peoplePlus, "id", "id",
      "city", "city", fields, selfPairs = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Linkage.linkageScoresMulti(peoplePlus, peoplePlus, "id", "id",
      Seq("city" -> "city", "zip" -> "zip"), fields, selfPairs = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    // city pass alone misses (1,6)/(2,6); zip pass recovers them
    assert(!single((1L, 6L)) && !single((2L, 6L)))
    assert(multi.keySet == single ++ Set((1L, 6L), (2L, 6L)))
    // a pair found by BOTH passes ((1,2): same city AND zip) scores once,
    // with the identical fixed-order score as the single-pass operator
    val base = Linkage.linkageScores(peoplePlus, peoplePlus, "id", "id",
      "city", "city", fields, selfPairs = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getInt(2), r.getDouble(3)))).toMap
    assert(multi((1L, 2L)) == base((1L, 2L)))
    // the recovered pair agrees on zip + initial + active = all 3 fields
    assert(multi((1L, 6L))._1 == 3)
  }

  test("linkageScoresMulti: expression block keys and per-pass cap") {
    // pass on a composed expression; cap kills the over-cap zip block
    val out = Linkage.linkageScoresMulti(peoplePlus, peoplePlus, "id", "id",
      Seq("zip" -> "zip"), fields, selfPairs = true, maxBlockSize = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // zip 11111 has 3 members (1,2,6) > cap -> dropped; 22222 (4,5) kept
    assert(out == Set((4L, 5L)))
  }

  test("blockAuditMulti: one audit row per (pass, block), pair volumes exact") {
    val rows = Linkage.blockAuditMulti(peoplePlus, peoplePlus,
      Seq("city" -> "city", "zip" -> "zip"), selfPairs = true)
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(4))).toMap
    assert(rows((0, "springfield")) == 3L) // C(3,2)
    assert(rows((0, "shelbyville")) == 1L)
    assert(rows((0, "capital")) == 0L)
    assert(rows((1, "11111")) == 3L)       // zip pass: {1,2,6}
    assert(rows((1, "22222")) == 1L)
    assert(rows((1, "99999")) == 0L)
  }
}
