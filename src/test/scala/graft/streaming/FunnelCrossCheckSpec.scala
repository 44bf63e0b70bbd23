package graft.streaming

import graft.SparkTestBase
import graft.operators.Funnel
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming funnel cross-check: the first streaming completion
 * per key must equal the batch `Funnel.completions` row (both implement
 * greedy earliest-next matching); repeat conversions are streaming-only
 * by design and are asserted separately.
 */
class FunnelCrossCheckSpec extends SparkTestBase {

  private def t(minute: Int) = Timestamp.valueOf(f"2026-03-01 09:$minute%02d:00")

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)

  // u1 completes view→click→purchase twice; u2 violates order; u3 partial.
  private val events = Seq(
    Ev(1L, t(1), "view"), Ev(1L, t(3), "click"), Ev(1L, t(5), "purchase"),
    Ev(1L, t(10), "view"), Ev(1L, t(12), "click"), Ev(1L, t(14), "purchase"),
    Ev(2L, t(2), "click"), Ev(2L, t(4), "view"),
    Ev(3L, t(6), "view"), Ev(3L, t(8), "click"))

  private val steps = Seq("view", "click", "purchase")

  test("first streaming completion equals batch completions; repeats emit again") {
    val bdf = df("user_id BIGINT, ts TIMESTAMP, event_type STRING",
      events.map(e => Row(e.user_id, e.ts, e.event_type)))
    val batch = Funnel.completions(bdf, "user_id", "ts", "event_type", steps)
      .collect().map(r => (r.getLong(0).toString,
        r.getTimestamp(1), r.getTimestamp(3))).toSet

    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.funnel(mem.toDF(), "ts", "user_id",
      "event_type", steps)
    val q = out.writeStream.format("memory").queryName("fcc_out")
      .outputMode("append").start()
    val stream =
      try {
        // split mid-funnel: u1's second conversion spans the batch break
        val (first, rest) = events.splitAt(5)
        mem.addData(first: _*); q.processAllAvailable()
        mem.addData(rest: _*); q.processAllAvailable()
        spark.sql("SELECT * FROM fcc_out").collect()
          .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      } finally q.stop()

    // two completions for u1 (repeat), none for u2/u3
    assert(stream.length == 2 && stream.forall(_._1 == "1"))
    // the FIRST streaming completion matches batch exactly
    assert(batch == Set(("1", t(1), t(5))))
    assert(stream.minBy(_._2.getTime) == ("1", t(1), t(5)))
    assert(stream.maxBy(_._2.getTime) == ("1", t(10), t(14)))
  }
}
