package graft.streaming

import graft.SparkTestBase
import graft.operators.IncrementalAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Batch ↔ streaming cross-check for incremental aggregate maintenance:
 * Structured Streaming's complete-mode grouped aggregation IS
 * incremental maintenance (state + per-batch fold), and its state
 * schema here is exactly [[IncrementalAgg]]'s partial state — so
 * [[IncrementalAgg.finish]] applies verbatim to the streaming result,
 * and the numbers must equal a batch merge tree over the same
 * micro-batches. Proves the monoid the batch operator implements is
 * the one the engine's own streaming state machine uses.
 */
object IncrementalAggCrossCheckSpec {
  case class Rec(k: String, v: Option[Double])
}

class IncrementalAggCrossCheckSpec extends SparkTestBase {
  import IncrementalAggCrossCheckSpec.Rec

  test("streaming grouped agg state equals the batch partial-state merge") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val batches = Seq(
      Seq(Rec("a", Some(1.10)), Rec("a", Some(2.20)), Rec("b", Some(5.00))),
      Seq(Rec("b", None), Rec("c", Some(-3.30))),
      Seq(Rec("a", Some(0.70)), Rec("c", Some(1.00))))

    val mem = MemoryStream[Rec]
    val agg = mem.toDF().groupBy("k").agg(
      count(col("v")).as("n"),
      sum(col("v").cast("decimal(18,2)")).as("sum_dec"),
      min(col("v")).as("min_v"),
      max(col("v")).as("max_v"))
    val q = agg.writeStream.format("memory").queryName("ia_stream")
      .outputMode("complete").start()
    val streamed =
      try {
        batches.foreach { b => mem.addData(b); q.processAllAvailable() }
        IncrementalAgg.finish(spark.table("ia_stream"), Seq("k"))
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
              r.getDouble(5))).toMap
      } finally q.stop()

    val states = batches.map(b =>
      IncrementalAgg.state(b.toDF(), Seq("k"), "v"))
    val merged = IncrementalAgg.finish(
      IncrementalAgg.merge(Seq("k"), states: _*), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap

    assert(streamed == merged)
    assert(streamed("a") == ((3L, 4.0, 0.70, 2.20, 4.0 / 3)))
  }
}
