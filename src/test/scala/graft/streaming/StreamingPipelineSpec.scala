package graft.streaming

import graft.SparkTestBase
import graft.model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingPipelineSpec extends SparkTestBase {

  private def sqlContextImplicit = spark.sqlContext

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)

  private def t(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("stateless stages (filter/select) apply to a stream and produce rows") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, t(0), 7, "click", 10.0), Ev(2, t(1), 8, "view", 0.5),
      Ev(3, t(2), 7, "click", 99.0))
    val out = StreamingPipeline.applyStages(spark, mem.toDF(), Seq(
      FilterStage("f", "", None, Seq(FilterCondition("event_type", "=", "click"))),
      SelectStage("s", "", None, Seq("event_id", "value"))))
    val q = out.writeStream.format("memory").queryName("stateless_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM stateless_out ORDER BY event_id").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
      assert(rows.head.schema.fieldNames.toSeq == Seq("event_id", "value"))
    } finally q.stop()
  }

  test("watermarked windowed aggregation emits closed windows in append mode") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.windowedAggregate(
      mem.toDF(), "ts", "event_type", window = "10 minutes",
      watermarkDelay = "5 minutes",
      aggregations = Seq(Aggregation("count", "*", Some("n")),
        Aggregation("sum", "CAST(value AS DECIMAL(18,4))", Some("total"))))
    val q = out.writeStream.format("memory").queryName("windowed_out")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(5), 1, "click", 2.0),
        Ev(3, t(11), 2, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first window
      mem.addData(Ev(9, t(59), 1, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, n, CAST(total AS STRING) FROM windowed_out ORDER BY window_start")
        .collect()
      assert(rows.exists(r => r.getString(0) == "click" && r.getLong(1) == 2L &&
        r.getString(2) == "3.0000"))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeated content keys") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.dedupStream(mem.toDF(), "ts", Seq("user_id", "event_type"),
      watermarkDelay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, t(0), 7, "click", 1.0), Ev(2, t(1), 7, "click", 2.0),
        Ev(3, t(2), 8, "click", 3.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM dedup_out").head().getLong(0) == 2L)
    } finally q.stop()
  }

  test("SORT and UNION-distinct are rejected up front with actionable errors") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val err = intercept[UnsupportedOperationException] {
      StreamingPipeline.applyStages(spark, mem.toDF(), Seq(
        SortStage("x", "", None, Seq(SortKey("value", "DESC")))))
    }
    assert(err.getMessage.contains("SORT"))
  }

  case class Turn(conv: Long, ts: Timestamp, turn: Long,
                  role: String, content: String)

  test("assembleConversations matches batch renderChatML when conversations close") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Turn]
    val out = StreamingPipeline.assembleConversations(
      mem.toDF(), "ts", "conv", "turn", "role", "content",
      gap = "5 minutes", watermarkDelay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("convs_out")
      .outputMode("append").start()
    try {
      // conv 1 arrives out of order and across two micro-batches (the
      // second batch's t(0) turn stays inside the 10-minute lateness
      // allowance — a tighter watermark would legally drop it)
      mem.addData(Turn(1L, t(1), 1L, "assistant", "hello\nthere"))
      q.processAllAvailable()
      mem.addData(Turn(1L, t(0), 0L, "user", "hi"), Turn(1L, t(2), 2L, "user", "bye"))
      q.processAllAvailable()
      // watermark far past conv 1's last turn + gap → it closes
      mem.addData(Turn(2L, t(30), 0L, "user", "new conv"))
      q.processAllAvailable()
      mem.addData(Turn(2L, t(59), 1L, "assistant", "late"))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT conv_id, n_turns, rendered FROM convs_out WHERE conv_id = '1'")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      val batch = graft.operators.Sft.renderChatML(
          Seq((1L, 0L, "user", "hi"), (1L, 1L, "assistant", "hello\nthere"),
            (1L, 2L, "user", "bye")).toDF("conv", "turn", "role", "content"),
          "conv", "turn", "role", "content")
        .collect().map(r => (r.getLong(0).toString, r.getLong(1), r.getString(2))).toSeq
      assert(got == batch, s"\nstream: $got\nbatch:  $batch")
    } finally q.stop()
  }

  test("sessionize: gap-based sessions close via event-time timeout (flatMapGroupsWithState)") {
    implicit val sq = sqlContextImplicit
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.sessionize(
      mem.toDF(), "ts", "user_id", gap = "5 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 7: events at 10:00, 10:02 (one session), then 10:20 (a new one)
      mem.addData(Ev(1, t(0), 7, "click", 1.0), Ev(2, t(2), 7, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(3, t(20), 7, "click", 1.0))
      q.processAllAvailable()
      // push the watermark far past 10:20 + gap so every session times out
      mem.addData(Ev(9, t(59), 8, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, session_start, session_end, n_events FROM sessions_out ORDER BY session_start")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      val u7 = rows.filter(_._1 == "7")
      assert(u7.length == 2, s"expected 2 sessions for user 7, got ${u7.toSeq}")
      assert(u7(0)._2 == t(0) && u7(0)._3 == t(2) && u7(0)._4 == 2L) // merged session
      assert(u7(1)._2 == t(20) && u7(1)._3 == t(20) && u7(1)._4 == 1L)
    } finally q.stop()
  }
}
