package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class PreferenceSpec extends SparkTestBase {

  private lazy val cands = df("g STRING, id BIGINT, s DOUBLE", Seq(
    Row("a", 1L, 0.9), Row("a", 2L, 0.1), Row("a", 3L, 0.5),
    Row("b", 4L, 0.6), Row("b", 5L, 0.6),      // tie on both ends
    Row("c", 6L, 0.7)))                        // single candidate

  test("pairs picks best-vs-worst with margin gating") {
    val out = Preference.pairs(cands, "g", "id", "s", minMargin = 0.05)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // group b: margin 0 < 0.05 → dropped; group c: best==worst → dropped
    assert(out.toSeq == Seq(("a", 1L, 2L, 0.8)))
  }

  test("pairs tie-breaks to the smaller id on both ends") {
    val out = Preference.pairs(cands, "g", "id", "s", minMargin = 0.0)
      .orderBy("group").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // group b ties 0.6/0.6: chosen = min id 4; worst side also min id 4 →
    // chosen == rejected → dropped even at margin 0
    assert(out.toSeq == Seq(("a", 1L, 2L)))
  }

  test("topBottomPairs emits non-crossing rank-i pairs") {
    val five = df("g STRING, id BIGINT, s DOUBLE", Seq(
      Row("x", 1L, 0.9), Row("x", 2L, 0.8), Row("x", 3L, 0.5),
      Row("x", 4L, 0.2), Row("x", 5L, 0.1)))
    val out = Preference.topBottomPairs(five, "g", "id", "s",
        k = 3, minMargin = 0.0)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // n=5 → floor(5/2)=2 pairs despite k=3; rank 1 = strongest contrast
    assert(out.toSeq == Seq((1L, 1L, 5L, 0.8), (2L, 2L, 4L, 0.6)))
  }

  test("topBottomPairs never pairs a candidate with itself") {
    val two = df("g STRING, id BIGINT, s DOUBLE", Seq(
      Row("y", 1L, 0.9), Row("y", 2L, 0.1)))
    val out = Preference.topBottomPairs(two, "g", "id", "s",
        k = 5, minMargin = 0.0).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L)))
    assert(out.forall { case (c, rj) => c != rj })
  }
}
