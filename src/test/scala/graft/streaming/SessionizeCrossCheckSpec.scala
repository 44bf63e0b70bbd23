package graft.streaming

import graft.SparkTestBase
import graft.operators.Sessionize
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming sessionize cross-check: Sessionize.batch (window
 * functions) and StreamingPipeline.sessionize (flatMapGroupsWithState)
 * claim the same gap semantics — prove it by running BOTH over the same
 * events and asserting identical session sets (key, start, end, count).
 */
class SessionizeCrossCheckSpec extends SparkTestBase {

  private def t(minute: Int) = Timestamp.valueOf(f"2026-03-01 09:$minute%02d:00")

  // user 1: three sessions (0-3, 20-21, 40); user 2: two sessions (1, 30-32);
  // gap = 5 minutes. Deliberately interleaved and unordered within batches —
  // batch sorts in the window, streaming sorts per micro-batch.
  private val events = Seq(
    (1L, t(2)), (1L, t(0)), (2L, t(1)), (1L, t(3)),
    (1L, t(21)), (1L, t(20)), (2L, t(30)), (2L, t(32)), (2L, t(31)),
    (1L, t(40)))

  case class Ev(user_id: Long, ts: Timestamp)

  test("batch and streaming sessionize produce identical session sets") {
    // ---- batch side
    val bdf = df("user_id BIGINT, ts TIMESTAMP", events.map { case (u, ts) => Row(u, ts) })
    val batch = Sessionize.batch(bdf, "ts", "user_id", gapSeconds = 300)
      .collect()
      .map(r => (r.getLong(0).toString, r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet

    // ---- streaming side: same events over two micro-batches, sessions
    // closed by pushing the watermark far past every end + gap
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.sessionize(
      mem.toDF(), "ts", "user_id", gap = "5 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("scc_out")
      .outputMode("append").start()
    val stream =
      try {
        val (first, rest) = events.splitAt(6)
        mem.addData(first.map { case (u, ts) => Ev(u, ts) })
        q.processAllAvailable()
        mem.addData(rest.map { case (u, ts) => Ev(u, ts) })
        q.processAllAvailable()
        mem.addData(Ev(99L, t(59))) // watermark sentinel
        q.processAllAvailable()
        spark.sql("SELECT key, session_start, session_end, n_events FROM scc_out")
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
          .filter(_._1 != "99") // the sentinel's own session never closes
          .toSet
      } finally q.stop()

    assert(stream == batch,
      s"\nstreaming: ${stream.toSeq.sortBy(_.toString)}\nbatch:     ${batch.toSeq.sortBy(_.toString)}")
    // and the sets are what the gap rule says they should be
    assert(batch == Set(
      ("1", t(0), t(3), 3L), ("1", t(20), t(21), 2L), ("1", t(40), t(40), 1L),
      ("2", t(1), t(1), 1L), ("2", t(30), t(32), 3L)))
  }
}
