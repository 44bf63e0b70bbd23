package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import java.sql.Timestamp

class RfmSpec extends SparkTestBase {

  private def ts(day: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  // c1: freshest + heaviest; c2 close behind; c3/c4 share frequency 1
  private def txns = df("cust STRING, ts TIMESTAMP, amt DOUBLE", Seq(
    Row("c1", ts(2), 10.0), Row("c1", ts(6), 10.0), Row("c1", ts(10), 10.0),
    Row("c2", ts(5), 10.0), Row("c2", ts(9), 10.0),
    Row("c3", ts(8), 10.0),
    Row("c4", ts(1), 5.0)))

  test("two-bucket scores: hand-checked board") {
    val out = Rfm.scores(txns, "cust", "ts", "amt", buckets = 2)
      .orderBy("customer").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6),
        r.getString(7))).toSeq
    assert(out == Seq(
      ("c1", 0L, 3L, 30.0, 2, 2, 2, "222"),
      ("c2", 1L, 2L, 20.0, 2, 2, 2, "222"),
      ("c3", 2L, 1L, 10.0, 1, 1, 1, "111"),
      ("c4", 9L, 1L, 5.0, 1, 1, 1, "111")))
  }

  test("ties share a bucket (empirical-CDF scoring, not NTILE)") {
    // c3 and c4 both have frequency 1 -> identical f score
    val out = Rfm.scores(txns, "cust", "ts", "amt", buckets = 2)
      .collect().map(r => r.getString(0) -> r.getInt(5)).toMap
    assert(out("c3") == out("c4"))
  }

  test("quintiles on distinct values match NTILE semantics") {
    // 10 customers, all metrics distinct -> bucket = ntile quintile
    val rows = (1 to 10).map(i => Row(f"c$i%02d", ts(i), i * 10.0))
    val d10 = df("cust STRING, ts TIMESTAMP, amt DOUBLE", rows)
    val out = Rfm.scores(d10, "cust", "ts", "amt", buckets = 5)
      .collect().map(r => r.getString(0) -> (r.getInt(4), r.getInt(6))).toMap
    // customer 10: most recent + biggest spender -> r=5, m=5
    assert(out("c10") == ((5, 5)))
    assert(out("c01") == ((1, 1)))
    // two customers per quintile
    val mCounts = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(mCounts == Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2, 5 -> 2))
  }

  test("segment summary: customers, spend, and 6-dp share") {
    val out = Rfm.segmentSummary(txns, "cust", "ts", "amt", buckets = 2)
      .orderBy("segment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(out == Seq(
      ("111", 2L, 15.0, BigDecimal(15.0 / 65).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("222", 2L, 50.0, BigDecimal(50.0 / 65).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("NULL timestamps drop; all-NULL amounts score as 0.00") {
    val d = df("cust STRING, ts TIMESTAMP, amt DOUBLE", Seq(
      Row("a", ts(1), null), Row("b", ts(2), 7.0), Row("c", null, 9.0)))
    val out = Rfm.scores(d, "cust", "ts", "amt", buckets = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out == Map("a" -> 0.0, "b" -> 7.0))
  }
}
