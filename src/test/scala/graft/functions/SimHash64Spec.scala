package graft.functions

import graft.{GraftSession, SparkTestBase}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SimHash64Spec extends SparkTestBase {

  test("identical token sets give identical fingerprints; similar sets are close") {
    val d = df("toks ARRAY<STRING>", Seq(
      Row(Seq("spark", "data", "join", "group", "sort", "filter")),
      Row(Seq("spark", "data", "join", "group", "sort", "filter")),
      Row(Seq("spark", "data", "join", "group", "sort", "scan")),
      Row(Seq("entirely", "different", "words", "here", "now", "ok"))))
    val fps = d.select(GraftSession.simhash64(
        transform(col("toks"), t => xxhash64(t))).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    val near = java.lang.Long.bitCount(fps(0) ^ fps(2))
    val far = java.lang.Long.bitCount(fps(0) ^ fps(3))
    assert(near < far, s"near=$near far=$far")
  }

  test("matches a reference implementation computed in plain Scala") {
    val tokens = Seq("alpha", "beta", "gamma")
    val d = df("toks ARRAY<STRING>", Seq(Row(tokens)))
    val viaSpark = d.select(
        GraftSession.simhash64(transform(col("toks"), t => xxhash64(t))).as("fp"),
        transform(col("toks"), t => xxhash64(t)).as("hashes"))
      .head()
    val hashes = viaSpark.getSeq[Long](1)
    // plain-Scala SimHash over the same hashes
    val counts = Array.fill(64)(0)
    hashes.foreach { h =>
      (0 until 64).foreach(p => if (((h >>> p) & 1L) == 1L) counts(p) += 1 else counts(p) -= 1)
    }
    var expected = 0L
    (0 until 64).foreach(p => if (counts(p) > 0) expected |= (1L << p))
    assert(viaSpark.getLong(0) == expected)
  }

  test("sql registration via GraftExtensions works") {
    val d = df("toks ARRAY<STRING>", Seq(Row(Seq("a", "b"))))
    d.createOrReplaceTempView("simhash_in")
    val viaSql = spark.sql(
      "SELECT simhash64(transform(toks, t -> xxhash64(t))) AS fp FROM simhash_in")
    val viaCol = d.select(GraftSession.simhash64(
      transform(col("toks"), t => xxhash64(t))).as("fp"))
    assert(viaSql.head().getLong(0) == viaCol.head().getLong(0))
  }
}
