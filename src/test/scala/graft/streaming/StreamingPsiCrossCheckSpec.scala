package graft.streaming

import graft.SparkTestBase
import graft.operators.Drift
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming PSI cross-check: Drift.psiWindowed (epoch-aligned
 * k-day tumbles vs a static reference) and StreamingPipeline.psiStream
 * (per-window GroupState histogram closed by event-time timeout) claim
 * digit-identical PSI — prove it by running both over the same events
 * split across micro-batches, including a window whose histogram spans
 * batches and a reference-only level (the vanished-level ε term).
 */
class StreamingPsiCrossCheckSpec extends SparkTestBase {

  case class Ev(ts: Timestamp, v: String)

  private def t(day: Int, hour: Int) =
    Timestamp.valueOf(f"2026-03-$day%02d $hour%02d:00:00")

  // reference: a 60/30/10 mix including level "c" the stream never emits
  private val reference = df("v STRING",
    Seq.fill(6)(Row("a")) ++ Seq.fill(3)(Row("b")) ++ Seq.fill(1)(Row("c")))

  // two 2-day windows (2026-03-01 = epoch day 20513, odd; windowDays=2
  // tumbles start on even epoch days → windows [02-28,03-01], [03-02,03-03],
  // [03-04,03-05]; events land in the last two)
  private val events = Seq(
    Ev(t(2, 9), "a"), Ev(t(2, 10), "a"), Ev(t(3, 8), "b"),
    Ev(t(4, 9), "b"), Ev(t(4, 10), "b"), Ev(t(5, 11), "a"))

  test("streaming windowed PSI equals the batch operator digit for digit") {
    val bdf = df("ts TIMESTAMP, v STRING",
      events.map(e => Row(e.ts, e.v)))
    val batch = Drift.psiWindowed(bdf, "ts", "v", reference, windowDays = 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2))).toSet
    assert(batch.size == 2 && batch.map(_._2) == Set(3L))

    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.psiStream(mem.toDF(), "ts", "v",
      reference, windowDays = 2, watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("psi_out")
      .outputMode("append").start()
    val stream =
      try {
        // window 1's histogram arrives across TWO batches
        mem.addData(events.take(2))
        q.processAllAvailable()
        mem.addData(events.slice(2, 5))
        q.processAllAvailable()
        mem.addData(events.drop(5))
        q.processAllAvailable()
        mem.addData(Ev(t(20, 0), "a")) // watermark sentinel closes both
        q.processAllAvailable()
        spark.sql("SELECT window_start, n, psi FROM psi_out")
          .collect().map(r => (r.getDate(0).toString, r.getLong(1),
            r.getDouble(2)))
          .filter(_._1 < "2026-03-10") // the sentinel's window stays open
          .toSet
      } finally q.stop()
    assert(stream == batch,
      s"\nstreaming: ${stream.toSeq.sorted}\nbatch:     ${batch.toSeq.sorted}")
  }
}
