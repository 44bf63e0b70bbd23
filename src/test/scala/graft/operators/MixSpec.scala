package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MixSpec extends SparkTestBase {

  private def corpus(ids: Range, tag: String) =
    df("id BIGINT, src STRING",
      ids.map(i => Row(i.toLong, tag)))

  test("weightedMix: exact ratio, bounded by the scarcest source") {
    // n = (10, 3, 7), parts = (2, 1, 1) -> T = min(5, 3, 7) = 3 -> (6, 3, 3)
    val out = Mix.weightedMix(Seq(
      (corpus(0 until 10, "a"), 2),
      (corpus(100 until 103, "b"), 1),
      (corpus(200 until 207, "c"), 1)), "id", "s")
    val bySource = out.groupBy("mix_source").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySource == Map(0 -> 6L, 1 -> 3L, 2 -> 3L))
    // the scarcest source is taken whole
    assert(out.filter(col("mix_source") === 1).select("id")
      .collect().map(_.getLong(0)).toSet == Set(100L, 101L, 102L))
  }

  test("weightedMix is deterministic and a subset of its inputs") {
    val a = corpus(0 until 50, "a"); val b = corpus(100 until 120, "b")
    val once = Mix.weightedMix(Seq((a, 1), (b, 1)), "id", "seed")
    val twice = Mix.weightedMix(Seq((a, 1), (b, 1)), "id", "seed")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
    assert(once.count() == 40) // T = min(50, 20) = 20 -> 20 + 20
    assert(once.select("id").exceptAll(a.unionByName(b).select("id")).isEmpty)
    // a different salt picks a different subset of the larger source
    val other = Mix.weightedMix(Seq((a, 1), (b, 1)), "id", "seed2")
    assert(once.filter(col("mix_source") === 0).select("id").exceptAll(
      other.filter(col("mix_source") === 0).select("id")).count() > 0)
  }

  test("repeatToBudget: full epochs plus md5-ranked remainder") {
    // n = 4, target 10, cap 3 -> t = 10: every row twice, first 2 ranks thrice
    val out = Mix.repeatToBudget(corpus(0 until 4, "a"), "id", 10L, 3, "e")
    assert(out.count() == 10)
    val reps = out.groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.values.toSeq.sorted == Seq(2L, 2L, 3L, 3L))
    // epochs are contiguous from 0 per row
    val eps = out.groupBy("id").agg(min("epoch").as("lo"), max("epoch").as("hi"),
      countDistinct("epoch").as("k")).collect()
    assert(eps.forall(r => r.getLong(1) == 0L &&
      r.getLong(2) == r.getLong(3) - 1))
  }

  test("repeatToBudget: the maxEpochs cap binds under a huge target") {
    val out = Mix.repeatToBudget(corpus(0 until 4, "a"), "id", 1000L, 2, "e")
    assert(out.count() == 8) // t = min(1000, 2*4)
    assert(out.groupBy("id").count().collect().forall(_.getLong(1) == 2L))
  }

  test("repeatToBudget: target below n selects the md5-ranked prefix once") {
    val out = Mix.repeatToBudget(corpus(0 until 10, "a"), "id", 3L, 5, "e")
    assert(out.count() == 3)
    assert(out.select("epoch").collect().forall(_.getLong(0) == 0L))
    // determinism: same 3 rows every run
    val again = Mix.repeatToBudget(corpus(0 until 10, "a"), "id", 3L, 5, "e")
    assert(out.exceptAll(again).isEmpty)
  }

  test("mix plan: budget broadcasts; data ranks stay bucket-partitioned") {
    val plan = Mix.weightedMix(Seq(
      (corpus(0 until 10, "a"), 1), (corpus(100 until 110, "b"), 1)), "id", "s")
      .queryExecution.executedPlan.toString
    // the 1-row budget joins by broadcast, never a shuffle
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    // every row_number over DATA is partitioned by the 256 hash-prefix
    // buckets (the only unpartitioned windows are the 256-row bucket-
    // offset aggregates inside deterministicShuffle, documented there)
    val rowNumberWindows = "row_number.*windowspecdefinition\\(([^,)]*)"
      .r.findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(rowNumberWindows.nonEmpty &&
      rowNumberWindows.forall(_.contains("__b")), plan)
  }

  /** Brute-force water level: binary-search λ with Σ min(cap, wλ) = B. */
  private def waterRef(caps: Map[String, Long], ws: Map[String, Double],
                       b: Double): Map[String, Long] = {
    var (lo, hi) = (0.0, 1e12)
    (1 to 200).foreach { _ =>
      val mid = (lo + hi) / 2
      if (caps.map { case (k, c) => math.min(c.toDouble, ws(k) * mid) }.sum < b)
        lo = mid
      else hi = mid
    }
    // epsilon guards the floor when λ converges to an exact integer share
    caps.map { case (k, c) =>
      k -> math.min(c.toDouble, math.floor(ws(k) * lo + 1e-6)).toLong }
  }

  test("budgetMix matches the water-filling reference across regimes") {
    import org.apache.spark.sql.functions._
    val data = corpus(0 until 40, "big") // caps: big=40, mid=12, tiny=3
      .union(corpus(100 until 112, "mid"))
      .union(corpus(200 until 203, "tiny"))
    val ws = Map("big" -> 1.0, "mid" -> 2.0, "tiny" -> 6.0)
    val wCol = when(col("src") === "big", 1.0)
      .when(col("src") === "mid", 2.0).otherwise(6.0)
    for (budget <- Seq(9L, 30L, 54L, 100L)) {
      val got = Mix.budgetMix(data, "id", "src", wCol, lit(budget), "t")
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ref = waterRef(Map("big" -> 40L, "mid" -> 12L, "tiny" -> 3L), ws,
        budget.toDouble).filter(_._2 > 0)
      assert(got == ref, s"budget=$budget: $got vs $ref")
      // never over budget, within #groups under (per-group floors)
      val total = got.values.sum
      assert(total <= budget && total >= math.min(budget, 55L) - 3,
        s"budget=$budget drew $total")
    }
  }

  test("budgetMix selection is deterministic and nested under growing budgets") {
    import org.apache.spark.sql.functions._
    val data = corpus(0 until 20, "a").union(corpus(100 until 120, "b"))
    def pick(b: Long) = Mix.budgetMix(data, "id", "src", lit(1.0), lit(b), "s")
      .select("id").collect().map(_.getLong(0)).toSet
    val small = pick(10)
    assert(small == pick(10))            // rerun-identical
    assert(small.subsetOf(pick(30)))     // md5 ranks nest: more budget only adds
  }

  test("temperatureWeights: T=1 is natural, T→∞ flattens, T=2 matches hand math") {
    // 90/9/1 split — the head-heavy shape temperature sampling exists for
    val data = corpus(0 until 90, "en")
      .union(corpus(100 until 109, "fr"))
      .union(corpus(200 until 201, "sw"))
    def shares(t: Double): Map[String, (Double, Long)] =
      Mix.temperatureWeights(data, "src", t).collect()
        .map(r => r.getString(0) -> ((r.getDouble(3), r.getLong(4)))).toMap

    val t1 = shares(1.0)
    assert(t1("en")._1 == 0.9 && t1("fr")._1 == 0.09 && t1("sw")._1 == 0.01)
    assert(t1("en")._2 == 90L) // T=1: targets reproduce raw counts

    // T=2: q_i ∝ sqrt(n_i): sqrt(90)+sqrt(9)+sqrt(1) = 9.48683... + 3 + 1
    val z = math.sqrt(90.0) + 3.0 + 1.0
    val t2 = shares(2.0)
    assert(math.abs(t2("en")._1 - math.sqrt(90.0) / z) < 1e-6)
    assert(math.abs(t2("sw")._1 - 1.0 / z) < 1e-6)
    // tail group's target grows from 1 toward uniform as T rises
    val t100 = shares(100.0)
    assert(t100("sw")._2 > t2("sw")._2 && t2("sw")._2 >= t1("sw")._2)
    assert(math.abs(t100("en")._1 - 1.0 / 3) < 0.02) // near-uniform
    // shares always normalize
    Seq(t1, t2, t100).foreach { m =>
      assert(math.abs(m.values.map(_._1).sum - 1.0) < 1e-5)
    }
  }

  test("interleave: stride keys give every prefix the weight mix") {
    import org.apache.spark.sql.Row
    def src(n: Int, tag: String) = df("id BIGINT, tag STRING",
      (1 to n).map(i => Row(i.toLong, tag)))
    val out = Mix.interleave(
      Seq((src(300, "big"), 3.0), (src(100, "small"), 1.0)), "id", "s")
      .orderBy("mix_key", "mix_source", "id")
      .collect().map(_.getString(1))
    assert(out.length == 400)
    // any aligned prefix carries ~3:1; check at 25% and 50%
    val p100 = out.take(100).count(_ == "big")
    val p200 = out.take(200).count(_ == "big")
    assert(p100 >= 73 && p100 <= 77, s"p100=$p100")
    assert(p200 >= 148 && p200 <= 152, s"p200=$p200")
    // deterministic
    val again = Mix.interleave(
      Seq((src(300, "big"), 3.0), (src(100, "small"), 1.0)), "id", "s")
      .orderBy("mix_key", "mix_source", "id")
      .collect().map(_.getString(1))
    assert(out.toSeq == again.toSeq)
  }

  test("Sample.weightedSamplePerKey: per-stratum quotas, weights respected") {
    import org.apache.spark.sql.Row
    val rows = (1L to 50L).map(i => Row("a", i, if (i <= 25) 100.0 else 0.01)) ++
      (51L to 60L).map(i => Row("b", i, 1.0))
    val d = df("k STRING, id BIGINT, w DOUBLE", rows)
    val out = Sample.weightedSamplePerKey(d, "k", "id", "w", k = 5, seed = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byKey = out.groupBy(_._1)
    assert(byKey("a").length == 5 && byKey("b").length == 5)
    // heavy a-rows dominate their stratum's draw
    assert(byKey("a").map(_._2).count(_ <= 25L) == 5)
  }

  test("doremiWeights: lagging domains upweight; zero excess recovers baseline") {
    val d = df("dom STRING, p DOUBLE, r DOUBLE, b DOUBLE", Seq(
      Row("lags", 2.0, 1.0, 0.5), Row("fits", 1.0, 1.5, 0.5)))
    val out = Mix.doremiWeights(d, "dom", "p", "r", "b", eta = 1.0)
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2)))).toMap
    assert(out("lags")._1 == 1.0 && out("fits")._1 == 0.0) // excess clamps
    val e = BigDecimal(math.exp(1.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = BigDecimal(0.5 * e).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = BigDecimal(raw / (raw + 0.5)).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("lags")._2 == expect)
    assert(math.abs(out("lags")._2 + out("fits")._2 - 1.0) < 1e-5)
    // all-zero excess: weights = normalized baseline (smoothing mixes uniform)
    val flat = df("dom STRING, p DOUBLE, r DOUBLE, b DOUBLE", Seq(
      Row("x", 1.0, 1.0, 0.75), Row("y", 1.0, 2.0, 0.25)))
    val w = Mix.doremiWeights(flat, "dom", "p", "r", "b", eta = 2.0,
        smoothing = 0.2)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(w("x") == 0.7 && w("y") == 0.3) // 0.8·b/Σb + 0.2/2
  }
}
