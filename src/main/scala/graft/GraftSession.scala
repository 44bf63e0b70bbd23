package graft

import graft.functions.SimHash64
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.CatalystBridge

/**
 * Session bootstrap: registers graft's native Catalyst expressions via the
 * public `SparkSessionExtensions` API and applies the scale-oriented
 * defaults (AQE, skew handling, sized shuffle partitions).
 *
 * Usable two ways:
 *  - `GraftSession.builder(...)` for a local session (tests, Bench, Verify);
 *  - `--conf spark.sql.extensions=graft.GraftExtensions` on a real cluster.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
  }
}

object GraftSession {

  /** `simhash64` as a Column function — works on any session (the Catalyst
    * expression is attached directly; SQL-name registration additionally
    * happens in sessions built with [[GraftExtensions]]). */
  def simhash64(c: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(c)))

  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      .withExtensions(new GraftExtensions)
      // Sized for local[N]; on a 1000-executor cluster AQE coalescing makes
      // the initial number a ceiling, not a fixed cost.
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Split even small files across all cores: a single-file scan
      // otherwise pins compute-heavy per-row expressions (shingling,
      // hashing) to ONE task regardless of cluster size.
      .config("spark.sql.files.minPartitionNum", shufflePartitions.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts is parquet TIMESTAMP(NANOS) — see Ingest.loadDir
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
