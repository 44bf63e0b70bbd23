package graft.streaming

import graft.SparkTestBase
import graft.operators.Timeseries
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming rolling-correlation cross-check:
 * Timeseries.rollingCorrelationEndKeyed (end-day-keyed cell
 * replication) and StreamingPipeline.rollingCorrelationStream
 * (per-end-day GroupState closed by event-time timeout) claim
 * digit-identical rows — prove it over the same events split across
 * micro-batches, including a day whose sums span batches, a gap day
 * (window-breaking NULL), and out-of-order arrival within the
 * watermark. Also pin the end-keyed variant against the grid-window
 * original on observed days.
 */
class StreamingRollCorrCrossCheckSpec extends SparkTestBase {

  case class Ev(ts: Timestamp, x: Double, y: Double)

  private def t(day: Int, hour: Int) =
    Timestamp.valueOf(f"2026-03-$day%02d $hour%02d:00:00")

  // 8 observed days over a 9-day span (03-05 is a gap) with a 3-day
  // window: early days NULL (k<3), the gap breaks windows covering it,
  // correlated-then-anticorrelated segments give nontrivial corr values
  private val events = Seq(
    Ev(t(1, 9), 1.0, 2.0), Ev(t(1, 17), 3.0, 4.1),
    Ev(t(2, 8), 2.0, 3.0), Ev(t(3, 9), 4.0, 5.5),
    Ev(t(4, 10), 3.0, 4.7), Ev(t(6, 9), 5.0, 1.0),
    Ev(t(7, 11), 6.0, 0.5), Ev(t(8, 9), 7.0, 0.25),
    Ev(t(9, 8), 6.5, 0.75))

  private def asRows = df("ts TIMESTAMP, x DOUBLE, y DOUBLE",
    events.map(e => Row(e.ts, e.x, e.y)))

  private def canon(rows: Array[Row])
      : Set[(String, Option[Double], Option[Double], Option[Double])] = {
    def od(r: Row, i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    rows.map(r =>
      (r.getDate(0).toString, od(r, 1), od(r, 2), od(r, 3))).toSet
  }

  test("end-keyed variant equals the grid window on observed days") {
    val grid = canon(Timeseries.rollingCorrelation(
      asRows, "ts", "x", "y", window = 3).collect())
    val keyed = canon(Timeseries.rollingCorrelationEndKeyed(
      asRows, "ts", "x", "y", window = 3).collect())
    // grid emits the gap day too (NULL means); keyed only observed days
    assert(grid.size == 9 && keyed.size == 8)
    val gridObserved = grid.filter(_._1 != "2026-03-05")
    assert(keyed == gridObserved,
      s"\nkeyed: ${keyed.toSeq.sortBy(_._1)}\ngrid:  ${gridObserved.toSeq.sortBy(_._1)}")
    // sanity: some corr defined, gap-covering windows NULL
    assert(keyed.exists(_._4.isDefined))
    assert(keyed.filter(r => r._1 == "2026-03-06" || r._1 == "2026-03-07")
      .forall(_._4.isEmpty)) // windows spanning the 03-05 gap: k < 3
  }

  test("streaming rolling correlation equals the end-keyed batch digit " +
      "for digit") {
    val batch = canon(Timeseries.rollingCorrelationEndKeyed(
      asRows, "ts", "x", "y", window = 3).collect())

    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val out = StreamingPipeline.rollingCorrelationStream(mem.toDF(),
      "ts", "x", "y", window = 3, watermarkDelay = "1 hour")
    val q = out.writeStream.format("memory").queryName("rollcorr_out")
      .outputMode("append").start()
    val stream =
      try {
        // day 1's sums arrive across TWO batches; day 3 arrives BEFORE
        // day 2's second half would (out-of-order within watermark)
        mem.addData(events.take(1))
        q.processAllAvailable()
        mem.addData(events.slice(1, 4))
        q.processAllAvailable()
        mem.addData(events.slice(4, 7))
        q.processAllAvailable()
        mem.addData(events.drop(7))
        q.processAllAvailable()
        mem.addData(Ev(t(25, 0), 0.0, 0.0)) // watermark sentinel
        q.processAllAvailable()
        canon(spark.sql(
          "SELECT day, x_mean, y_mean, corr FROM rollcorr_out")
          .where("day < '2026-03-20'") // the sentinel's windows stay open
          .collect())
      } finally q.stop()
    assert(stream == batch,
      s"\nstreaming: ${stream.toSeq.sortBy(_._1)}\nbatch:     ${batch.toSeq.sortBy(_._1)}")
  }
}
