package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AnnSpec extends SparkTestBase {

  // Controlled corpus: 0↔1 identical, 2 a close neighbour of 0, 3/4 far.
  private def vec(parts: Double*): Seq[Double] = parts
  private lazy val corpus = df("id BIGINT, v ARRAY<DOUBLE>", Seq(
    Row(0L, vec(1, 0, 0, 0, 1, 0, 0, 1)),
    Row(1L, vec(1, 0, 0, 0, 1, 0, 0, 1)),
    Row(2L, vec(1, 0.1, 0, 0, 1, 0, 0, 0.9)),
    Row(3L, vec(-1, 2, 0.5, -3, 0, 1, 2, -1)),
    Row(4L, vec(0, -1, 3, 2, -2, 0.5, -1, 0))))
  private lazy val probes = corpus.filter("id = 0")
    .select(col("id").as("qid"), col("v").as("qv"))

  test("brute force: exact ranking, self excluded, identical vector first") {
    val out = Ann.bruteForceTopK(corpus, "id", "v", probes, "qid", "qv", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.head == ((1, 1L, 1.0)))    // identical vector, cosine 1
    assert(out(1)._2 == 2L)               // near neighbour second
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("LSH top-k finds the identical and near vectors (high-similarity recall)") {
    val out = Ann.lshTopK(corpus, "id", "v", probes, "qid", "qv",
      k = 3, nBits = 64, bands = 16)
      .collect().map(_.getLong(2))
    assert(out.contains(1L)) // identical vector shares every band
    assert(out.contains(2L)) // near vector shares ≥1 of 16 bands w.h.p.
  }

  test("cosine near-dup pairs confirm with exact cosine at the threshold") {
    val pairs = Ann.cosineNearDupPairs(corpus, "id", "v",
      threshold = 0.95, nBits = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((0L, 1L)))
    assert(pairs.find(p => (p._1, p._2) == (0L, 1L)).get._3 == 1.0)
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L)) // far vector absent
  }

  test("IVF top-k: identical vector recalled from the probed cells") {
    val out = Ann.ivfTopK(corpus, "id", "v", probes, "qid", "qv",
      k = 3, nCentroids = 2, nProbe = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.head._2 == 1L && out.head._3 == 1.0) // identical vec, same cell
  }

  test("IVF recall vs brute force on the real embeddings (nProbe=all == exact)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val p = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val bf = Ann.bruteForceTopK(e, "vec_id", "v", p, "qid", "qv", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // probing every cell must reproduce the exact result
    val ivf = Ann.ivfTopK(e, "vec_id", "v", p, "qid", "qv", k = 5,
      nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == bf)
  }

  test("LSH recall vs brute force on the real embeddings table (top-1 of identical)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val bf = Ann.bruteForceTopK(e, "vec_id", "v", p, "qid", "qv", k = 5)
      .filter("rank = 1").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val lsh = Ann.lshTopK(e, "vec_id", "v", p, "qid", "qv", k = 5,
      nBits = 64, bands = 16).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    // random 64-dim vectors: expect the true top-1 recalled for most probes
    val hits = bf.count { case (q, top1) => lsh.get(q).exists(_.contains(top1)) }
    assert(hits >= 5, s"top-1 recall too low: $hits/10")
  }
}
