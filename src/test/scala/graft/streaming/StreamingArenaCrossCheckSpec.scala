package graft.streaming

import graft.SparkTestBase
import graft.operators.Preference
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Batch ↔ streaming arena cross-check: the streaming pair-count /
 * leaderboard aggregates ([[StreamingPipeline.arenaPairCounts]],
 * [[StreamingPipeline.leaderboardStream]]) fed across multiple
 * micro-batches must end at exactly the state the batch operators
 * compute over the whole comparison set — including the Bradley–Terry
 * fit run per-trigger from the incremental pair counts.
 */
class StreamingArenaCrossCheckSpec extends SparkTestBase {

  // two "phases" of an arena: item 0 dominates early, item 2 late —
  // so per-trigger snapshots genuinely differ and the final state is a
  // real accumulation, not a single-batch echo
  private val phase1 = Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 2L))
  private val phase2 = Seq((2L, 0L), (2L, 1L), (2L, 1L), (0L, 1L))
  private val all = phase1 ++ phase2

  private def batchDf = df("w BIGINT, l BIGINT",
    all.map { case (a, b) => Row(a, b) })

  test("streamed pair counts + per-trigger BT match the batch fit") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)]
    val counts = StreamingPipeline.arenaPairCounts(
      mem.toDF().toDF("w", "l"), "w", "l")

    var lastFit: Seq[(Long, Double, Long, Double)] = Nil
    val q = counts.writeStream.outputMode("complete")
      .foreachBatch { (pairs: org.apache.spark.sql.DataFrame, _: Long) =>
        lastFit = Preference.bradleyTerryFromPairs(pairs, iterations = 5)
          .orderBy("item").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
            r.getDouble(3))).toSeq
      }.start()
    try {
      mem.addData(phase1: _*); q.processAllAvailable()
      val mid = lastFit
      mem.addData(phase2: _*); q.processAllAvailable()
      val expected = Preference.bradleyTerry(batchDf, "w", "l",
          iterations = 5)
        .orderBy("item").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(lastFit == expected)
      assert(mid != lastFit) // the stream genuinely accumulated
    } finally q.stop()
  }

  test("streaming leaderboard ends at the batch leaderboard minus rank") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)]
    val lb = StreamingPipeline.leaderboardStream(
      mem.toDF().toDF("w", "l"), "w", "l")
    val q = lb.writeStream.outputMode("complete")
      .format("memory").queryName("arena_lb").start()
    try {
      mem.addData(phase1: _*); q.processAllAvailable()
      mem.addData(phase2: _*); q.processAllAvailable()
      val streamed = spark.table("arena_lb").orderBy("item").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val batch = Preference.leaderboard(batchDf, "w", "l")
        .drop("rank").orderBy("item").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
