package graft.streaming

import graft.SparkTestBase
import graft.operators.Classifier
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Batch ↔ streaming classifier-scoring cross-check: a model trained
 * with [[Classifier.fitLogistic]] must score a STREAM of documents
 * (literal-weight pure projection, [[Classifier.scoreInline]])
 * bit-for-bit like the batch join path ([[Classifier.scoreLogistic]])
 * — the train-batch / serve-stream hand-off of a production filter.
 */
class ClassifierStreamCrossCheckSpec extends SparkTestBase {

  private val docs = Seq(
    (1L, "good clean prose", 1.0), (2L, "good solid text", 1.0),
    (3L, "bad spam junk", 0.0), (4L, "bad noisy junk", 0.0),
    (5L, "", 0.0), (6L, "good junk", 1.0))

  test("streamed inline scoring equals the batch join path") {
    val corpus = df("id BIGINT, text STRING, y DOUBLE",
      docs.map { case (i, t, y) => Row(i, t, y) })
    val w = Classifier.fitLogistic(corpus, "id", "text", "y",
      buckets = 32, iterations = 4, lr = 1.0)
    val batch = Classifier.scoreLogistic(corpus, "id", "text", w, 32)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))

    val (bias, wm) = Classifier.collectWeights(w)
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val scored = Classifier.scoreInline(
      mem.toDF().toDF("id", "text"), "id", "text", bias, wm, 32)
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("cls_scores").start()
    try {
      mem.addData(docs.take(3).map(d => (d._1, d._2)): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(3).map(d => (d._1, d._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("cls_scores").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
