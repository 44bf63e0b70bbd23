package graft.streaming

import graft.SparkTestBase
import graft.operators.Sample
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming rate-limit cross-check: Sample.rateLimit (window
 * row_number) and StreamingPipeline.rateLimit (flatMapGroupsWithState)
 * claim the same admitted set when a bucket's events arrive within one
 * micro-batch — prove it, then show the cross-batch first-come rule.
 */
class RateLimitCrossCheckSpec extends SparkTestBase {

  private def t(minute: Int) = Timestamp.valueOf(f"2026-03-01 09:$minute%02d:00")

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long)

  // user 1 bursts 5 events in one 10-min bucket (cap 2 binds), then 1 in
  // the next bucket; user 2 stays under cap. Unordered within the batch.
  private val events = Seq(
    Ev(1L, t(3), 103L), Ev(1L, t(1), 101L), Ev(1L, t(1), 100L),
    Ev(1L, t(5), 105L), Ev(1L, t(7), 107L),
    Ev(1L, t(12), 112L),
    Ev(2L, t(4), 204L), Ev(2L, t(6), 206L))

  test("single-batch arrival: streaming admitted set equals the batch operator's") {
    val bdf = df("user_id BIGINT, ts TIMESTAMP, event_id BIGINT",
      events.map(e => Row(e.user_id, e.ts, e.event_id)))
    val batch = Sample.rateLimit(bdf, "user_id", "ts", "event_id",
        windowSeconds = 600L, maxPerWindow = 2)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(batch == Set(100L, 101L, 112L, 204L, 206L)) // ties: id orders 100 first

    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.rateLimit(mem.toDF(), "ts", "user_id",
      "event_id", windowSeconds = 600L, maxPerWindow = 2)
    val q = out.writeStream.format("memory").queryName("rl_out")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT tie FROM rl_out")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("cross-batch arrival: earlier batch holds its slots, state caps later ones") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.rateLimit(mem.toDF(), "ts", "user_id",
      "event_id", windowSeconds = 600L, maxPerWindow = 2)
    val q = out.writeStream.format("memory").queryName("rl_out2")
      .outputMode("append").start()
    try {
      // batch 1: two late-ish events fill the quota
      mem.addData(Ev(1L, t(7), 107L), Ev(1L, t(5), 105L))
      q.processAllAvailable()
      // batch 2: an EARLIER event arrives — quota already spent, rejected
      mem.addData(Ev(1L, t(1), 101L))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT tie FROM rl_out2")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == Set(105L, 107L))
    } finally q.stop()
  }
}
