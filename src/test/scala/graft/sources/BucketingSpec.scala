package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkTestBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("co-bucketed tables sort-merge-join with zero Exchange") {
    val left = df("k BIGINT, v STRING", (0 until 1000).map(i => Row(i.toLong, s"l$i")))
    val right = df("k BIGINT, w STRING", (0 until 1000).map(i => Row(i.toLong, s"r$i")))
    Bucketing.writeBucketed(left, "bkt_left", Seq("k"), nBuckets = 4)
    Bucketing.writeBucketed(right, "bkt_right", Seq("k"), nBuckets = 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() == 1000)
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle:\n$p")
      // NOTE: a per-task Sort remains — Spark 3.1+ dropped bucketed-scan
      // output ordering by default (restorable via the legacy
      // spark.sql.legacy.bucketedTableScan.outputOrdering flag when each
      // bucket is one file); sorting already-sorted runs is cheap and
      // local, the Exchange was the scale cost.

      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("bkt_left").groupBy("k").agg(count(lit(1)))
      assert(!plan(agg).contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n${plan(agg)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
