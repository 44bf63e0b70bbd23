package graft.streaming

import graft.SparkTestBase
import graft.operators.IntervalJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/**
 * Batch ↔ streaming interval-join cross-check: IntervalJoin.join
 * (time-bin equi-join + refine) and StreamingPipeline.intervalJoinStream
 * (watermarked stream-stream join with a state bound) claim the same
 * `start <= ts < end` + key semantics — prove it by running BOTH over
 * the same points/ranges and asserting identical match sets.
 */
class IntervalJoinCrossCheckSpec extends SparkTestBase {

  private def t(minute: Int) = Timestamp.valueOf(f"2026-03-01 09:$minute%02d:00")

  // ranges per key (≤ 10 min wide — inside the stream's maxRangeWidth);
  // k1 has overlapping ranges (a point can match twice), k2 disjoint
  private val ranges = Seq(
    ("k1", "r1", t(0), t(10)), ("k1", "r2", t(5), t(12)),
    ("k2", "r3", t(0), t(4)), ("k2", "r4", t(20), t(30)),
    ("k1", "r5", t(30), t(30))) // zero-width: matches nothing
  // points: in-range, boundary (start inclusive, end exclusive), miss,
  // wrong key
  private val points = Seq(
    ("k1", "p1", t(6)),  // inside r1 AND r2
    ("k1", "p2", t(0)),  // start-inclusive r1
    ("k1", "p3", t(10)), // end-exclusive r1, inside r2
    ("k2", "p4", t(4)),  // end-exclusive r3 -> no match
    ("k2", "p5", t(25)), // inside r4
    ("k3", "p6", t(6)),  // key with no ranges
    ("k1", "p7", t(30))) // zero-width range never matches

  case class Pt(key: String, pid: String, ts: Timestamp)
  case class Rg(key: String, rid: String, start: Timestamp, end: Timestamp)

  test("batch and streaming interval join produce identical match sets") {
    val expected = Set(("p1", "r1"), ("p1", "r2"), ("p2", "r1"),
      ("p3", "r2"), ("p5", "r4"))

    // ---- batch side
    val bp = df("key STRING, pid STRING, ts TIMESTAMP",
      points.map { case (k, p, ts) => Row(k, p, ts) })
    val br = df("key STRING, rid STRING, start TIMESTAMP, end TIMESTAMP",
      ranges.map { case (k, r, s, e) => Row(k, r, s, e) })
    val batch = IntervalJoin.join(bp, br, "ts", "start", "end",
        keys = Seq("key"), binSeconds = 300)
      .select("pid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(batch == expected)

    // ---- streaming side: both sides streamed across two micro-batches
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pMem = MemoryStream[Pt]
    val rMem = MemoryStream[Rg]
    val out = StreamingPipeline.intervalJoinStream(
      pMem.toDF(), rMem.toDF(), "ts", "start", "end", keys = Seq("key"),
      maxRangeWidth = "15 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("ijcc_out")
      .outputMode("append").start()
    try {
      val (r1, r2) = ranges.splitAt(2)
      val (p1, p2) = points.splitAt(3)
      rMem.addData(r1.map { case (k, r, s, e) => Rg(k, r, s, e) })
      pMem.addData(p1.map { case (k, p, ts) => Pt(k, p, ts) })
      q.processAllAvailable()
      rMem.addData(r2.map { case (k, r, s, e) => Rg(k, r, s, e) })
      pMem.addData(p2.map { case (k, p, ts) => Pt(k, p, ts) })
      q.processAllAvailable()
      val stream = spark.sql("SELECT pid, rid FROM ijcc_out")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(stream == expected, s"stream=$stream")
    } finally q.stop()
  }
}
