package graft

/**
 * Plan inspector: `graft.Explain <queryName> [sfDir]` prints the formatted
 * physical plan and timed row count for one SparkEntry query — the
 * iterate-on-the-plan loop (broadcast? pushdown? codegen spans?).
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse {
      System.err.println(s"usage: graft.Explain <query> [sfDir]\nqueries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $name materialized in $dt%.2fs at $sfDir")
    spark.stop()
  }
}
