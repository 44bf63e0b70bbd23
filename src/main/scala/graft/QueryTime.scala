package graft

/** Ad-hoc timing probe: run the named gate queries against a testdata
  * dir with the noop sink, twice each, printing per-run seconds — the
  * single-query magnifier for anything `Bench` flags.
  *
  * Usage: QueryTime <sfDir> <query> [query...]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryTime <sfDir> <query> [query...]")
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-querytime")
    def once(n: String): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[qt] $n ${(System.nanoTime() - t0) / 1e9}%.2fs")
      Console.out.flush()
      // free caller-owned checkpoint blocks between runs (Checkpoints)
      graft.plans.Checkpoints.release(df)
    }
    once("q_pipeline") // warmup
    args.tail.foreach { n => once(n); once(n) }
    spark.stop()
  }
}
