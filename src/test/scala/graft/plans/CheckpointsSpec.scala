package graft.plans

import graft.SparkTestBase
import graft.operators.Graph
import org.apache.spark.sql.Row

/**
 * The checkpoint-lifetime contract ([[Checkpoints]] scaladoc): an
 * iterative operator's returned frame is backed by caller-owned
 * localCheckpoint blocks; [[Checkpoints.release]] must actually free
 * them (the sf1 round-8 finding: unreleased results degraded
 * back-to-back heavy queries 54.9 s → 198 s), be a safe no-op on
 * checkpoint-free plans, and leave the frame dead afterwards.
 */
class CheckpointsSpec extends SparkTestBase {

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release frees a returned pageRank checkpoint and kills the frame") {
    val edges = df("src BIGINT, dst BIGINT",
      Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 1L), Row(1L, 3L)))
    val before = persistentRddIds
    val ranks = Graph.pageRank(edges, "src", "dst", iterations = 3)
    assert(ranks.count() == 3)
    val added = persistentRddIds -- before
    assert(added.nonEmpty,
      "pageRank's returned frame should hold checkpoint storage " +
        "(otherwise this contract is pointless)")
    val n = Checkpoints.release(ranks, blocking = true)
    assert(n >= 1, s"release found no checkpoint leaf in the plan (n=$n)")
    val after = persistentRddIds
    assert((added -- after) == added,
      s"release left checkpoint RDD(s) ${added.intersect(after)} persisted")
    // the frame is dead: a local checkpoint cannot recompute
    intercept[Exception] { ranks.count() }
  }

  test("release is a safe no-op on a plain plan") {
    val plain = df("x BIGINT", Seq(Row(1L), Row(2L))).filter("x > 0")
    assert(Checkpoints.release(plain) == 0)
    assert(plain.count() == 2) // untouched
  }
}
