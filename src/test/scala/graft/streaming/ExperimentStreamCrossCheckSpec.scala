package graft.streaming

import graft.SparkTestBase
import graft.operators.Experiment
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Batch ↔ streaming cross-check for the A/B operators: each is ONE
 * global conditional aggregate + a scalar projection, which is exactly
 * Structured Streaming's complete-mode shape — the UNCHANGED operator
 * runs on a stream and its final micro-batch must equal the batch
 * result over the same rows (the "experiment dashboard" deployment:
 * z/t/θ re-emitted as assignments arrive).
 */
object ExperimentStreamCrossCheckSpec {
  case class Trial(v: String, ok: Boolean, y: Double, x: Double)
  case class SegTrial(g: String, v: String, ok: Boolean, y: Double)
}

class ExperimentStreamCrossCheckSpec extends SparkTestBase {
  import ExperimentStreamCrossCheckSpec.Trial

  private val batches = Seq(
    Seq(Trial("A", true, 1.0, 1.0), Trial("A", false, 2.0, 2.5),
      Trial("B", true, 3.0, 2.0)),
    Seq(Trial("B", false, 1.5, 1.0), Trial("A", true, 2.5, 3.0),
      Trial("B", false, 0.5, 0.0)),
    Seq(Trial("A", false, 4.0, 3.5), Trial("B", true, 2.0, 2.5)))

  private def crossCheck(name: String)
                        (op: org.apache.spark.sql.DataFrame =>
                          org.apache.spark.sql.DataFrame): Unit = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Trial]
    val q = op(mem.toDF()).writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    val streamed = try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table(name).collect().map(_.toSeq).toSeq
    } finally q.stop()
    val batch = op(batches.flatten.toDF()).collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"$name stream != batch")
    assert(batch.nonEmpty && batch.head.exists(_ != null))
  }

  test("proportionZ runs unchanged on a stream (complete mode) and equals batch") {
    crossCheck("ab_z_stream")(d => Experiment.proportionZ(d, "v", "ok", "A", "B"))
  }

  test("welchT runs unchanged on a stream and equals batch") {
    crossCheck("ab_t_stream")(d => Experiment.welchT(d, "v", "y", "A", "B"))
  }

  test("cuped runs unchanged on a stream and equals batch") {
    crossCheck("ab_cuped_stream")(d =>
      Experiment.cuped(d, "v", "y", "x", "A", "B"))
  }

  test("msprt runs unchanged on a stream — the always-valid monitor IS its deployment") {
    crossCheck("ab_msprt_stream")(d =>
      Experiment.msprt(d, "v", "y", "A", "B", tau = 1.0))
  }

  private val segBatches = Seq(
    Seq(ExperimentStreamCrossCheckSpec.SegTrial("s1", "A", true, 1.0),
      ExperimentStreamCrossCheckSpec.SegTrial("s1", "B", false, 3.0),
      ExperimentStreamCrossCheckSpec.SegTrial("s2", "A", false, 2.0)),
    Seq(ExperimentStreamCrossCheckSpec.SegTrial("s2", "B", true, 4.0),
      ExperimentStreamCrossCheckSpec.SegTrial("s1", "A", false, 2.0),
      ExperimentStreamCrossCheckSpec.SegTrial("s1", "B", true, 1.0)),
    Seq(ExperimentStreamCrossCheckSpec.SegTrial("s2", "A", true, 5.0),
      ExperimentStreamCrossCheckSpec.SegTrial("s2", "B", false, 1.5)))

  test("proportionZGrouped runs unchanged on a stream — the segment sweep dashboard") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[ExperimentStreamCrossCheckSpec.SegTrial]
    val q = Experiment.proportionZGrouped(mem.toDF(), "g", "v", "ok", "A", "B")
      .writeStream.format("memory").queryName("ab_zg_stream")
      .outputMode("complete").start()
    val streamed = try {
      segBatches.foreach { b => mem.addData(b); q.processAllAvailable() }
      spark.table("ab_zg_stream").collect()
        .map(_.toSeq).sortBy(_.head.toString).toSeq
    } finally q.stop()
    val batch = Experiment.proportionZGrouped(
        segBatches.flatten.toDF(), "g", "v", "ok", "A", "B")
      .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(streamed == batch)
    assert(batch.size == 2)
  }
}
