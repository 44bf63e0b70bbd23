package graft.streaming

import graft.SparkTestBase
import graft.operators.{Pii, QualityFilter, Sample}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * The curation operators are stateless projections/filters, so they apply
 * to a stream UNCHANGED — the continuous-ingest shape of a training-data
 * pipeline (clean → score → scrub → sample at arrival time, no batch
 * boundary). These specs pin that property: streaming output ==
 * batch output on the same rows.
 */
class StreamingCurationSpec extends SparkTestBase {

  case class Doc(doc_id: Long, text: String, lang: String)

  private val docsFixture = Seq(
    Doc(1, (1 to 60).map(i => if (i % 7 == 0) "the" else s"tok$i").mkString(" "), "en"),
    Doc(2, "too short", "en"),
    Doc(3, "mail me at a@b.co or 10.1.2.3 now with the and of that be to have", "en"),
    Doc(4, "ein kurzer text und die der das mit", "de"))

  test("quality metrics + PII redaction on a stream equal the batch result") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    mem.addData(docsFixture: _*)
    val qStream = QualityFilter.metrics(mem.toDF(), "doc_id", "text")
    val rStream = Pii.redact(mem.toDF(), "doc_id", "text")
    val q1 = qStream.writeStream.format("memory").queryName("q_metrics_out")
      .outputMode("append").start()
    val q2 = rStream.writeStream.format("memory").queryName("q_redact_out")
      .outputMode("append").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val batchDf = spark.createDataFrame(docsFixture)
      val batchMetrics = QualityFilter.metrics(batchDf, "doc_id", "text")
        .orderBy("doc_id").collect().map(_.toSeq.map(String.valueOf)).toSeq
      val streamMetrics = spark.sql("SELECT * FROM q_metrics_out ORDER BY doc_id")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(streamMetrics == batchMetrics)
      val batchRedact = Pii.redact(batchDf, "doc_id", "text")
        .orderBy("doc_id").collect().map(_.getString(1)).toSeq
      val streamRedact = spark.sql("SELECT * FROM q_redact_out ORDER BY doc_id")
        .collect().map(_.getString(1)).toSeq
      assert(streamRedact == batchRedact)
      assert(streamRedact(2).contains("[EMAIL]") && streamRedact(2).contains("[IP]"))
    } finally { q1.stop(); q2.stop() }
  }

  test("deterministic stratified sampling on a stream equals the batch kept set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    mem.addData(docsFixture: _*)
    val fractions = Map("en" -> 0.8, "de" -> 0.0)
    val s = Sample.stratifiedHashSample(mem.toDF(), "lang", "text", fractions)
    val q = s.writeStream.format("memory").queryName("q_sample_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamKept = spark.sql("SELECT doc_id FROM q_sample_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      val batchKept = Sample.stratifiedHashSample(
          spark.createDataFrame(docsFixture), "lang", "text", fractions)
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(streamKept == batchKept)
      // de stratum fraction 0 → no de docs pass
      assert(!streamKept.contains(4L))
    } finally q.stop()
  }
}
