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
  case class HtmlPage(id: Long, html: String)

  private val docsFixture = Seq(
    Doc(1, (1 to 60).map(i => if (i % 7 == 0) "the" else s"tok$i").mkString(" "), "en"),
    Doc(2, "too short", "en"),
    Doc(3, "mail me at a@b.co or 10.1.2.3 now with the and of that be to have", "en"),
    Doc(4, "ein kurzer text und die der das mit", "de"))

  test("DSIR stream-scoring and within-doc line dedup apply to a stream unchanged") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Dsir, Lines}
    val mem = MemoryStream[Doc]
    val lineDocs = Seq(
      Doc(1, "alpha\nbeta\nalpha\ngamma", "en"),
      Doc(2, "x\nx", "de"),
      Doc(3, "solo", "en"))
    mem.addData(lineDocs: _*)
    val batchDf = spark.createDataFrame(lineDocs)
    val w = Dsir.bucketWeights(batchDf,
      batchDf.filter(col("lang") === "en"), "text", buckets = 256)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val scoreQ = Dsir.scoreWithWeights(mem.toDF(), "doc_id", "text", w,
        buckets = 256)
      .writeStream.format("memory").queryName("dsir_stream_out")
      .outputMode("append").start()
    val dedupQ = Lines.dedupLinesWithinDoc(mem.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("linededup_stream_out")
      .outputMode("append").start()
    try {
      scoreQ.processAllAvailable(); dedupQ.processAllAvailable()
      val batchScores = Dsir.scoreWithWeights(batchDf, "doc_id", "text", w,
          buckets = 256)
        .orderBy("doc_id").collect().map(_.toSeq.map(String.valueOf)).toSeq
      val streamScores = spark.sql(
          "SELECT * FROM dsir_stream_out ORDER BY doc_id")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(streamScores == batchScores && batchScores.size == 3)
      val streamDedup = spark.sql(
          "SELECT doc_id, text FROM linededup_stream_out ORDER BY doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamDedup(1L) == "alpha\nbeta\ngamma")
      assert(streamDedup(2L) == "x")
    } finally { scoreQ.stop(); dedupQ.stop() }
  }

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

  case class Page(id: Long, url: String, user: String)

  test("pseudonymization and domain blocklisting stream unchanged") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pages = Seq(
      Page(1, "https://ads.tracker.net/x", "alice"),
      Page(2, "https://docs.example.org/y", "alice"),
      Page(3, "https://sub.tracker.net/z", "bob"),
      Page(4, "junk", null))
    val mem = MemoryStream[Page]
    mem.addData(pages: _*)
    // pseudonymize is a pure projection and the INLINE blocklist a pure
    // filter — both legal on an unaggregated stream in append mode (the
    // join formulation's hit set would be a stream-stream anti-join)
    val cleaned = graft.operators.Web.blockByDomainInline(
      graft.operators.Pii.pseudonymize(mem.toDF(), Seq("user"), "s1"),
      "url", Seq("tracker.net"))
    val q = cleaned.writeStream.format("memory").queryName("q_web_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.sql("SELECT id, user FROM q_web_out ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val batch = graft.operators.Web.blockByDomainInline(
          graft.operators.Pii.pseudonymize(spark.createDataFrame(pages), Seq("user"), "s1"),
          "url", Seq("tracker.net"))
        .select("id", "user").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(stream == batch)
      assert(stream.map(_._1) == Seq(2L, 4L)) // tracker.net + subdomain dropped
    } finally q.stop()
  }

  test("incremental dedup against a STATIC history applies unchanged to a stream") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val history = spark.createDataFrame(Seq(
      Doc(100, "seen before", "en"), Doc(101, "also seen", "en")))
    val arriving = Seq(
      Doc(1, "brand new", "en"),
      Doc(2, "seen before", "en"),   // exact dup of history → dropped
      Doc(3, "also seen", "de"),     // dup by CONTENT despite other cols
      Doc(4, "fresh too", "en"))
    val mem = MemoryStream[Doc]
    mem.addData(arriving: _*)
    // bloom probe is a pure filter; the confirm is a stream-static
    // left_anti join — both legal in append mode
    val out = graft.operators.Dedup.incrementalDedup(
      mem.toDF(), history, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("q_incr_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.sql("SELECT doc_id FROM q_incr_out ORDER BY doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(stream == Seq(1L, 4L))
      val batch = graft.operators.Dedup.incrementalDedup(
          spark.createDataFrame(arriving), history, "doc_id", "text")
        .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("HTML extract → inline line blocklist → script profile on a stream equal batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pages = Seq(
      HtmlPage(1, "<html><body><p>Real content</p><div>SUBSCRIBE NOW</div></body></html>"),
      HtmlPage(2, "<p>Другой текст</p><div>SUBSCRIBE NOW</div><script>x()</script>"),
      HtmlPage(3, "no markup at all"))
    val mem = MemoryStream[HtmlPage]
    mem.addData(pages: _*)
    def chain(df: org.apache.spark.sql.DataFrame) = {
      val extracted = df.select(col("id"),
        graft.operators.Web.extractText(col("html")).as("text"))
      graft.operators.Lines.removeLinesInline(extracted, "text", Seq("SUBSCRIBE NOW"))
        .withColumn("script", graft.functions.TextFunctions.scriptProfile(col("text")))
    }
    val q = chain(mem.toDF()).writeStream.format("memory")
      .queryName("q_webtext_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.sql("SELECT * FROM q_webtext_out ORDER BY id")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      val batch = chain(spark.createDataFrame(pages)).orderBy("id")
        .collect().map(_.toSeq.map(String.valueOf)).toSeq
      assert(stream == batch)
      assert(stream(0)(1) == "Real content")         // boilerplate line gone
      assert(stream(1)(1) == "Другой текст")         // script stripped too
    } finally q.stop()
  }
}
