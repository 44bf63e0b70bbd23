package graft.streaming

import graft.SparkTestBase
import graft.operators.Linkage
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Batch ↔ streaming linkage cross-check: `Linkage.linkageScores` with a
 * STREAMING left side and a static master table is a stream-static
 * equi-join on the block key plus pure per-pair projections — no state,
 * no watermark (the incremental entity-resolution shape: score each
 * arriving record against the master file). Prove the claim by
 * streaming a batch of new records in two micro-batches and comparing
 * the scored pairs row-for-row with the batch run.
 */
case class NewRec(id: Long, city: String, zip: String, initial: String,
                  active: Boolean)

class StreamingLinkageCrossCheckSpec extends SparkTestBase {

  private lazy val master = df(
    "id BIGINT, city STRING, zip STRING, initial STRING, active BOOLEAN", Seq(
      org.apache.spark.sql.Row(1L, "springfield", "11111", "A", true),
      org.apache.spark.sql.Row(2L, "springfield", "11111", "A", true),
      org.apache.spark.sql.Row(3L, "springfield", "99999", "Z", false),
      org.apache.spark.sql.Row(4L, "shelbyville", "22222", "B", true),
      org.apache.spark.sql.Row(5L, "shelbyville", "22222", "C", false)))

  private val fields = Seq(
    Linkage.FieldSpec("zip", "zip", 0.9, 0.1),
    Linkage.FieldSpec("initial", "initial", 0.8, 0.04),
    Linkage.FieldSpec("active", "active", 0.9, 0.5))

  private val incoming = Seq(
    NewRec(101L, "springfield", "11111", "A", true),  // dup of 1/2
    NewRec(102L, "springfield", "00000", "Q", false), // block only
    NewRec(103L, "shelbyville", "22222", "B", true),  // dup of 4
    NewRec(104L, "capital", "33333", "D", true))      // no block match

  test("streamed new records score against the master exactly like batch") {
    import spark.implicits._
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getDouble(3))))

    val batch = rows(Linkage.linkageScores(incoming.toDF(), master,
      "id", "id", "city", "city", fields)).toMap
    assert(batch.nonEmpty && batch.keys.forall(_._1 >= 101L))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[NewRec]
    val sink = scala.collection.mutable.Map[(Long, Long), (Int, Double)]()
    val q = Linkage.linkageScores(mem.toDF(), master,
        "id", "id", "city", "city", fields)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows(b).foreach { case (k, v) => sink.synchronized { sink(k) = v } }
        ()
      }.start()
    try {
      val (h, t) = incoming.splitAt(2)
      mem.addData(h); q.processAllAvailable()
      mem.addData(t); q.processAllAvailable()
    } finally q.stop()
    assert(sink.toMap == batch, s"stream=${sink.toMap}\nbatch=$batch")
  }
}
