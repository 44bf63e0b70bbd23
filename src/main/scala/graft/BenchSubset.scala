package graft

/**
 * Subset benchmark for optimization A/B experiments: exactly
 * [[Bench]]'s per-query hygiene (System.gc() quiesce, noop sink,
 * checkpoint release, min-of-N) over only the queries named on the
 * command line. Diagnostic harness — the driver's board remains
 * `graft.Bench`, whose contract (full coverage, one JSON line) this
 * main deliberately does not carry.
 */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchSubset <query> [<query> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench-subset")
    def runOnce(name: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.plans.Checkpoints.release(df)
      (System.nanoTime() - t0) / 1e9
    }
    runOnce("q_pipeline") // warmup
    val out = args.map { n =>
      val best = (1 to math.max(1, reps)).map(_ => runOnce(n)).min
      println(f"[subset] $n $best%.2f")
      s""""$n":$best"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
