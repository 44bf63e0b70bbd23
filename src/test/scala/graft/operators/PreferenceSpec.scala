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

  private def bt(rows: Seq[(Long, Long)], iters: Int) =
    Preference.bradleyTerry(
        df("w BIGINT, l BIGINT", rows.map { case (a, b) => Row(a, b) }),
        "w", "l", iterations = iters)
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))

  test("bradleyTerry reaches the exact two-player fixed point") {
    // 0 beats 1 three times, 1 beats 0 once: d = 4/(p0+p1) = 2 each
    // round, so p = (3/2, 1/2) already normalized — a fixed point with
    // P(0 beats 1) = 1.5/2.0 = 0.75, the empirical win rate.
    for (iters <- Seq(1, 5)) {
      val out = bt(Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 0L)), iters)
      assert(out.toSeq == Seq((0L, 1.5, 4L, 3.0), (1L, 0.5, 4L, 1.0)))
    }
  }

  private def btTies(rows: Seq[(Long, Long, Double)], iters: Int) =
    Preference.bradleyTerryTies(
        df("a BIGINT, b BIGINT, o DOUBLE",
          rows.map { case (a, b, o) => Row(a, b, o) }),
        "a", "b", "o", iterations = iters)
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))

  test("bradleyTerryTies: all-tie players are exactly even") {
    val out = btTies(Seq((0L, 1L, 0.5), (1L, 0L, 0.5)), iters = 5)
    assert(out.toSeq == Seq((0L, 1.0, 2L, 1.0), (1L, 1.0, 2L, 1.0)))
  }

  test("bradleyTerryTies equals plain BT when a tie is two split games") {
    // one tie between 0 and 1 on top of a 0-dominant record ≡ one win
    // each at half weight... verified against the explicit half-win
    // pair table through the SAME fromPairs path
    val games = Seq((0L, 1L, 1.0), (0L, 1L, 1.0), (0L, 1L, 0.5))
    val viaTies = btTies(games, iters = 8)
    val pairs = df("i BIGINT, j BIGINT, n BIGINT, win_i DOUBLE",
      Seq(Row(0L, 1L, 3L, 2.5)))
    val viaPairs = Preference.bradleyTerryFromPairs(pairs, iterations = 8)
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(viaTies.toSeq == viaPairs.toSeq)
    // and the dominant side ends stronger
    assert(viaTies(0)._2 > viaTies(1)._2)
  }

  test("bradleyTerry orders a dominance chain and stays mean-1") {
    // 0 > 1 > 2 with transitive evidence; strengths must be strictly
    // decreasing and normalized to mean 1 (sum 3).
    val games = Seq.fill(3)((0L, 1L)) ++ Seq.fill(3)((1L, 2L)) ++
      Seq.fill(3)((0L, 2L))
    val out = bt(games, iters = 25)
    val s = out.map(_._2)
    assert(s(0) > s(1) && s(1) > s(2), s.toSeq.toString)
    assert(math.abs(s.sum - 3.0) < 1e-4, s.sum.toString)
  }

  test("bradleyTerry clamps an all-loss item instead of emitting zero") {
    // item 1 never wins: MM sends it to exactly 0 → clamp to 1e-6;
    // item 0 takes the whole normalized mass (k=2, sum p0 = p0_0).
    val out = bt(Seq((0L, 1L), (0L, 1L)), iters = 3)
    assert(out.toSeq == Seq((0L, 2.0, 2L, 2.0), (1L, 1e-6, 2L, 0.0)))
  }

  test("bradleyTerry is invariant to comparison row order") {
    val games = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 1L), (1L, 0L))
    assert(bt(games, 10).toSeq == bt(games.reverse, 10).toSeq)
  }

  test("leaderboardWilson brackets the win rate with exact Wilson bounds") {
    val out = Preference.leaderboardWilson(
        df("w BIGINT, l BIGINT", Seq(
          Row(0L, 1L), Row(0L, 1L), Row(1L, 0L))),
        "w", "l")
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def wilson(wins: Double, n: Double): (Double, Double) = {
      val z = 1.96; val z2 = z * z; val p = wins / n
      val c = (p + z2 / (2.0 * n)) / (1.0 + z2 / n)
      val h = (z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) /
        (1.0 + z2 / n)
      (math.max(c - h, 0.0), math.min(c + h, 1.0))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (item, rate, lo, hi) =>
      val (wins, n) = if (item == 0L) (2.0, 3.0) else (1.0, 3.0)
      val (elo, ehi) = wilson(wins, n)
      assert(lo == r6(elo), s"item $item lo")
      assert(hi == r6(ehi), s"item $item hi")
      assert(lo <= rate && rate <= hi)
      assert(lo >= 0.0 && hi <= 1.0)
    }
  }

  test("leaderboard counts games/wins and ranks by win rate") {
    val out = Preference.leaderboard(
        df("w BIGINT, l BIGINT", Seq(
          Row(0L, 1L), Row(0L, 1L), Row(1L, 2L), Row(2L, 0L))),
        "w", "l")
      .orderBy("item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    // item0: 3 games 2 wins (.667) rank 1; item1: 3 games 1 win (.333)
    // rank 2 ties item2: 2 games 1 win (0.5)... 0.5 > 0.333 so item2
    // rank 2, item1 rank 3.
    assert(out.toSeq == Seq(
      (0L, 3L, 2L, 0.666667, 1L),
      (1L, 3L, 1L, 0.333333, 3L),
      (2L, 2L, 1L, 0.5, 2L)))
  }
}
