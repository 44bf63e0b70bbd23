package graft

/**
 * Benchmark main — runs every SparkEntry query against
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query seconds.
 *
 * Each query is forced through the `noop` sink, not `count()`: count lets
 * Catalyst prune every projected column (a filter query would measure only
 * the predicate column scan), while noop materializes the full result
 * rows — what a real consumer pays. A warmup action first absorbs JVM/
 * codegen compilation so query 1 isn't charged for it.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name $dt%.2fs")
      dt
    }

    // Warmup: representative ops (scan+join+agg+sort) compile the codegen
    // paths; not reported.
    runOnce("q_pipeline")

    // Best-of-2: a single pass makes whichever query catches a GC pause or
    // codegen compile look 10x slower; min-of-2 reports steady-state cost.
    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      n -> math.min(runOnce(n), runOnce(n))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
