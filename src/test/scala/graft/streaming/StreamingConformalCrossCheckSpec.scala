package graft.streaming

import graft.SparkTestBase
import graft.operators.Eval
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Batch ↔ streaming conformal cross-check: Eval.conformal and
 * Eval.conformalStream (static calibration threshold + one running
 * test aggregate in Complete mode) claim the same final row — prove it
 * by streaming the test set across micro-batches and comparing the
 * last emitted row against the batch operator on identical data,
 * including the no-guarantee case (α too small → NULL threshold, NULL
 * coverage but live n_test).
 */
class StreamingConformalCrossCheckSpec extends SparkTestBase {

  case class Sc(s: Double)

  private val calRows = (1 to 10).map(i => Row(i.toDouble))
  private val testRows = Seq(3.0, 9.5, 10.0, 8.999999, 9.0000004)

  private def canon(r: Row) =
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))

  private def runStream(alpha: Double) = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cal = df("s DOUBLE", calRows)
    val mem = MemoryStream[Sc]
    val out = Eval.conformalStream(cal, mem.toDF(), "s", alpha)
    val q = out.writeStream.format("memory").queryName("conf_out")
      .outputMode("complete").start()
    try {
      mem.addData(testRows.take(2).map(Sc))
      q.processAllAvailable()
      mem.addData(testRows.drop(2).map(Sc))
      q.processAllAvailable()
      canon(spark.sql(
        "SELECT n_cal, rank, threshold, n_test, coverage FROM conf_out")
        .head())
    } finally q.stop()
  }

  test("streaming conformal's final row equals the batch operator") {
    val cal = df("s DOUBLE", calRows)
    val test = df("s DOUBLE", testRows.map(Row(_)))
    val batch = canon(Eval.conformal(cal, test, "s", alpha = 0.2).head())
    // alpha=0.2: rank 9 -> threshold 9.0; 9.0000004 rounds to the 6-dp
    // cell 9.0 and counts as covered — the cell discipline, both sides
    assert(batch._3.contains(9.0) && batch._5.contains(0.6))
    assert(runStream(0.2) == batch)
  }

  test("no-guarantee case (rank > n_cal) matches too") {
    val cal = df("s DOUBLE", calRows)
    val test = df("s DOUBLE", testRows.map(Row(_)))
    val batch = canon(Eval.conformal(cal, test, "s", alpha = 0.01).head())
    assert(batch._3.isEmpty && batch._5.isEmpty && batch._4 == 5L)
    assert(runStream(0.01) == batch)
  }
}
