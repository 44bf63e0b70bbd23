package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class WriterSpec extends SparkTestBase {

  private def parquetFiles(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(name).toString
    Files.delete(Paths.get(d)); d
  }

  test("writePartitioned: one file per partition, pruned reads, file-size caps") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSeq

    // default: repartition-by-key collapses each partition to ONE file
    val p1 = tmp("writer_one")
    Writer.writePartitioned(docs, p1, partitionBy = Seq("lang"),
      sortWithin = Seq("doc_id"))
    langs.foreach { l =>
      assert(parquetFiles(s"$p1/lang=$l").size == 1, s"expected 1 file for $l")
    }

    // read-back prunes partitions: only the matching directory is scanned
    val back = spark.read.parquet(p1).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(back.count() == docs.filter(col("lang") === "en").count())
    // round-trip content is identical
    assert(spark.read.parquet(p1).count() == docs.count())

    // maxRecordsPerFile caps rows per file
    val p2 = tmp("writer_cap")
    Writer.writePartitioned(docs, p2, partitionBy = Seq("lang"),
      maxRecordsPerFile = 50L)
    val enRows = docs.filter(col("lang") === "en").count()
    val enFiles = parquetFiles(s"$p2/lang=en").size
    assert(enFiles >= (enRows / 50).toInt && enFiles >= 2,
      s"expected ~${enRows / 50 + 1} files, got $enFiles")

    // hotBuckets spreads a hot partition across several writer tasks
    val p3 = tmp("writer_hot")
    Writer.writePartitioned(docs.repartition(8), p3, partitionBy = Seq("lang"),
      hotBuckets = 4)
    val hotFiles = parquetFiles(s"$p3/lang=en").size
    assert(hotFiles > 1 && hotFiles <= 4, s"expected 2..4 files, got $hotFiles")
    assert(spark.read.parquet(p3).count() == docs.count())
  }

  test("jsonl export: sharded file count and lossless round-trip") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = tmp("writer_jsonl")
    Writer.jsonl(docs, p, shards = 3)
    val parts = Files.list(Paths.get(p)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json")).toSeq
    assert(parts.size == 3, s"expected 3 shards, got ${parts.size}")
    // round-trip: every column and row identical to the source, including
    // multi-line text (JSON-escaped on the line) and explicit nulls
    val back = Ingest.jsonl(spark, p)
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")
    val orig = docs.selectExpr("doc_id", "text", "lang", "source", "n_chars")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
