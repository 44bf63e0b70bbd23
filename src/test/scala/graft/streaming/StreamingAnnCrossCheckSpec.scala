package graft.streaming

import graft.SparkTestBase
import graft.operators.Ann
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Batch ↔ streaming IVF-search cross-check: `Ann.ivfSearch` (batch,
 * broadcast probes + candidate dedup + window top-k) and
 * `Ann.ivfSearchStream` + per-batch `Ann.topK` (stream-static join, no
 * state) claim identical results for any probe batch against the same
 * static index — prove it by streaming the probes through a
 * MemoryStream in two micro-batches and comparing row-for-row.
 */
case class AnnProbe(query_id: Long, qv: Seq[Double])

class StreamingAnnCrossCheckSpec extends SparkTestBase {

  private def realEmbeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), VF.asDouble(col("embedding")).as("v"))

  test("streamed probes reproduce the batch IVF search exactly") {
    import spark.implicits._
    val e = realEmbeddings
    val idx = Ann.ivfIndex(e, "vec_id", "v", nCentroids = 8)
    // materialize the assignment once, as a query batch user would
    idx.assigned.persist()
    try {
      val probeRows = e.filter(col("vec_id") < 6).collect()
        .map(r => AnnProbe(r.getLong(0), r.getSeq[Double](1)))
      val probeDf = probeRows.toSeq.toDF()
      val batch = Ann.ivfSearch(idx, "vec_id", "v",
          probeDf, "query_id", "qv", k = 3, nProbe = 2)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

      implicit val sq = spark.sqlContext
      val mem = MemoryStream[AnnProbe]
      // per-micro-batch finalize: rank inside foreachBatch — the only
      // place append-mode streaming allows a per-query top-k
      val sink = scala.collection.mutable.Set[(Long, Long, Long, Double)]()
      val q = Ann.ivfSearchStream(idx, "vec_id", "v",
          mem.toDF(), "query_id", "qv", nProbe = 2)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          Ann.topK(b, 3).collect().foreach(r => sink.synchronized {
            sink += ((r.getLong(0), r.getLong(1), r.getLong(2),
              r.getDouble(3)))
          })
          ()
        }
        .start()
      try {
        val (h, t) = probeRows.splitAt(3)
        mem.addData(h.toSeq); q.processAllAvailable()
        mem.addData(t.toSeq); q.processAllAvailable()
      } finally q.stop()
      assert(sink.toSet == batch,
        s"stream=${sink.toSet.size} rows, batch=${batch.size} rows; " +
          s"diff=${(sink.toSet diff batch) ++ (batch diff sink.toSet)}")
    } finally idx.assigned.unpersist()
  }
}
