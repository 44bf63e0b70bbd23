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
}
