package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import scala.collection.mutable

/**
 * Optimization-round profiling harness (guide §1: measure first).
 * `ProfileQ <query> [<query> ...]` runs each named SparkEntry query
 * through the noop sink twice (run 1 absorbs codegen compile; run 2 is
 * instrumented) and prints, per query:
 *
 *  - a stage table (duration, task count, shuffle read/write bytes,
 *    records, memory/disk spill) from a SparkListener, and
 *  - the executed plan's per-operator SQLMetrics (rows, dataSize, op
 *    times) walked from the AQE final plan,
 *
 * then dumps `.explain("formatted")` to `plans/r10/<query>_<tag>.txt`
 * (tag from SPARK_GRAFT_PLAN_TAG, default "before"). Diagnostic only —
 * never part of the bench/oracle surface.
 */
object ProfileQ {
  private final class StageCollector extends SparkListener {
    final case class Row(id: Int, name: String, ms: Long, tasks: Int,
                         shufReadMB: Double, shufWriteMB: Double,
                         inRecords: Long, outRecords: Long,
                         spillMB: Double)
    val rows = mutable.ArrayBuffer[Row]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      val ms = (for {s <- si.submissionTime; c <- si.completionTime}
        yield c - s).getOrElse(-1L)
      rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(90), ms,
        si.numTasks,
        m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        m.shuffleReadMetrics.recordsRead,
        m.shuffleWriteMetrics.recordsWritten,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0)
    }
  }

  private def walk(p: SparkPlan, depth: Int, out: StringBuilder): Unit = {
    val keep = Seq("numOutputRows", "dataSize", "time in aggregation build",
      "aggregate time", "sort time", "shuffle write time", "time to build",
      "time to broadcast", "scan time", "duration", "shuffle records written",
      "records read", "number of output batches")
    val ms = p.metrics.collect {
      case (k, v) if v.value > 0 && keep.exists(k.contains) =>
        s"$k=${v.value}"
    }.toSeq.sorted.mkString(" ")
    out.append("  " * depth).append(p.nodeName)
    if (ms.nonEmpty) out.append("  [").append(ms).append("]")
    out.append('\n')
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children ++ other.subqueries
    }
    kids.foreach(walk(_, depth + 1, out))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQ <query> [<query> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val spark = GraftSession.builder(
      master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-profile")
    // plan-only mode: dump formatted plans without executing (cheap
    // "before" evidence capture for queries about to be changed)
    if (sys.env.get("SPARK_GRAFT_PLAN_ONLY").contains("1")) {
      val planDir = new java.io.File("plans/r10")
      planDir.mkdirs()
      for (name <- args) {
        val w = new java.io.PrintWriter(
          new java.io.File(planDir, s"${name}_$tag.txt"))
        try w.println(SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        finally w.close()
        System.err.println(s"[planonly] $name dumped")
      }
      spark.stop()
      return
    }
    // warmup: representative scan+join+agg+sort compile pass
    SparkEntry.queries("q_pipeline")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (name <- args) {
      // frame CONSTRUCTION is inside both timed regions — iterative
      // operators run their eager per-round checkpoints at build time,
      // and Bench times the build too
      spark.sparkContext.setJobDescription(s"profile:$name warm")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - t0) / 1e9
      graft.plans.Checkpoints.release(df)
      System.gc()
      val coll = new StageCollector
      spark.sparkContext.addSparkListener(coll)
      spark.sparkContext.setJobDescription(s"profile:$name timed")
      val t1 = System.nanoTime()
      val df2 = SparkEntry.queries(name)(spark, sfDir)
      df2.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.removeSparkListener(coll)
      println(f"\n===== $name run1=$warm%.2fs run2=$dt%.2fs =====")
      println(f"${"stage"}%6s ${"ms"}%8s ${"tasks"}%5s ${"shR_MB"}%8s " +
        f"${"shW_MB"}%8s ${"recR"}%10s ${"recW"}%10s ${"spill"}%7s  name")
      coll.rows.sortBy(-_.ms).foreach { r =>
        println(f"${r.id}%6d ${r.ms}%8d ${r.tasks}%5d ${r.shufReadMB}%8.1f " +
          f"${r.shufWriteMB}%8.1f ${r.inRecords}%10d ${r.outRecords}%10d " +
          f"${r.spillMB}%7.1f  ${r.name}")
      }
      val sb = new StringBuilder
      walk(df2.queryExecution.executedPlan, 0, sb)
      println("--- executed plan (with metrics) ---")
      println(sb.result())
      graft.plans.Checkpoints.release(df2)
      // formatted plan dump for the committed evidence
      val planDir = new java.io.File("plans/r10")
      planDir.mkdirs()
      val w = new java.io.PrintWriter(
        new java.io.File(planDir, s"${name}_$tag.txt"))
      try {
        val df3 = SparkEntry.queries(name)(spark, sfDir)
        w.println(df3.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } finally w.close()
    }
    spark.stop()
  }
}
