package graft.streaming

import graft.SparkTestBase
import graft.operators.Cohort
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.{Date, Timestamp}

/**
 * Batch ↔ streaming growth-accounting cross-check: Cohort.growthFlags
 * (full-log window equivalent) and Cohort.growthFlagsStream (per-user
 * GroupState + event-time timeouts) share one fold — prove the
 * continuous query emits the IDENTICAL per-user-day flag rows,
 * including gap churn emitted inline and trailing churn emitted by
 * watermark timeout, and that the flag rollup equals growthAccounting.
 */
class StreamingGrowthCrossCheckSpec extends SparkTestBase {

  case class Ev(user_id: Long, ts: Timestamp)

  private def t(day: Int, hour: Int) =
    Timestamp.valueOf(f"2026-03-$day%02d $hour%02d:00:00")

  // u1: days 1,2,4 -> new, retained, churn@3, resurrected@4, churn@5
  // u2: day 2 only -> new@2, churn@3
  private val events = Seq(
    (1L, t(1, 9)), (1L, t(1, 17)), (2L, t(2, 8)),
    (1L, t(2, 10)), (1L, t(4, 12)))

  test("streaming flags equal batch flags; rollup equals growthAccounting") {
    val bdf = df("user_id BIGINT, ts TIMESTAMP",
      events.map { case (u, ts) => Row(u, ts) })
    val batch = Cohort.growthFlags(bdf, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getDate(1), r.getString(2)))
      .toSet
    assert(batch == Set(
      ("1", Date.valueOf("2026-03-01"), "new"),
      ("1", Date.valueOf("2026-03-02"), "retained"),
      ("1", Date.valueOf("2026-03-03"), "churned"),
      ("1", Date.valueOf("2026-03-04"), "resurrected"),
      ("1", Date.valueOf("2026-03-05"), "churned"),
      ("2", Date.valueOf("2026-03-02"), "new"),
      ("2", Date.valueOf("2026-03-03"), "churned")))

    // rollup parity with the windowed day operator
    val acct = Cohort.growthAccounting(bdf, "user_id", "ts")
      .collect().map(r => (r.getDate(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val rolled = batch.groupBy(_._2).map { case (day, rows) =>
      def n(st: String) = rows.count(_._3 == st).toLong
      val active = n("new") + n("retained") + n("resurrected")
      (day, active, n("new"), n("retained"), n("resurrected"), n("churned"))
    }.toSet
    assert(rolled == acct, s"\nrolled: $rolled\nacct:   $acct")

    // ---- streaming side: three micro-batches in event-time order per
    // user, then a watermark sentinel to fire the trailing-churn timeouts
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = Cohort.growthFlagsStream(mem.toDF(), "ts", "user_id",
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("growth_out")
      .outputMode("append").start()
    val stream =
      try {
        mem.addData(Ev(1L, t(1, 9)), Ev(1L, t(1, 17)))
        q.processAllAvailable()
        mem.addData(Ev(2L, t(2, 8)), Ev(1L, t(2, 10)))
        q.processAllAvailable()
        mem.addData(Ev(1L, t(4, 12)))
        q.processAllAvailable()
        mem.addData(Ev(99L, t(20, 0))) // push the watermark past day 5
        q.processAllAvailable()
        spark.sql("SELECT user, day, status FROM growth_out")
          .collect().map(r => (r.getString(0), r.getDate(1), r.getString(2)))
          .filter(_._1 != "99") // the sentinel's own exit never observes
          .toSet
      } finally q.stop()
    assert(stream == batch,
      s"\nstreaming: ${stream.toSeq.sortBy(_.toString)}" +
        s"\nbatch:     ${batch.toSeq.sortBy(_.toString)}")
  }

  test("a timeout-churned user who returns resurrects without re-churning") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = Cohort.growthFlagsStream(mem.toDF(), "ts", "user_id",
      watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("growth_out2")
      .outputMode("append").start()
    val stream =
      try {
        mem.addData(Ev(1L, t(1, 9)))
        q.processAllAvailable()
        mem.addData(Ev(99L, t(10, 0))) // fires u1's churn@2 by timeout
        q.processAllAvailable()
        mem.addData(Ev(1L, t(12, 9))) // u1 returns after the churn fired
        q.processAllAvailable()
        mem.addData(Ev(99L, t(25, 0))) // fires u1's trailing churn@13
        q.processAllAvailable()
        spark.sql("SELECT user, day, status FROM growth_out2")
          .collect().map(r => (r.getString(0), r.getDate(1), r.getString(2)))
          .filter(_._1 != "99")
          .toSet
      } finally q.stop()
    assert(stream == Set(
      ("1", Date.valueOf("2026-03-01"), "new"),
      ("1", Date.valueOf("2026-03-02"), "churned"),   // once, via timeout
      ("1", Date.valueOf("2026-03-12"), "resurrected"),
      ("1", Date.valueOf("2026-03-13"), "churned")))
  }

  test("non-UTC session is rejected up front (epoch-day parity guard)") {
    // the stream buckets UTC epoch days in its closure while the batch
    // twin uses session-timezone to_date — a non-UTC session would
    // silently shift near-midnight events, so it must fail loudly
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        Cohort.growthFlagsStream(mem.toDF(), "ts", "user_id")
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
