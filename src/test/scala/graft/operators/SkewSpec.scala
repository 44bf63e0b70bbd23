package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  // Heavily skewed: one hot key carrying most rows, plus a tail.
  private lazy val facts = df("k STRING, v BIGINT, tag STRING",
    (1 to 500).map(i => Row("hot", i.toLong, s"t$i")) ++
      Seq(Row("a", 1L, "x"), Row("a", 3L, "y"), Row("b", 10L, "z")))

  private lazy val dim = df("k STRING, label STRING", Seq(
    Row("hot", "H"), Row("a", "A"), Row("c", "C")))

  test("salted aggregate equals plain groupBy for every decomposable function") {
    val salted = Skew.saltedAggregate(facts, Seq("k"), Seq(
      Skew.SaltedAgg("sum", "v", "sum_v"),
      Skew.SaltedAgg("count", "*", "n"),
      Skew.SaltedAgg("min", "v", "min_v"),
      Skew.SaltedAgg("max", "v", "max_v"),
      Skew.SaltedAgg("avg", "v", "avg_v")), buckets = 8)
    val plain = facts.groupBy("k").agg(
      sum("v").as("sum_v"), count(lit(1)).as("n"),
      min("v").as("min_v"), max("v").as("max_v"),
      (sum("v").cast("double") / count("v")).as("avg_v"))
    assert(salted.orderBy("k").collect().toSeq == plain.orderBy("k").collect().toSeq)
  }

  test("salting actually spreads the hot key across buckets — even identical rows") {
    val partialGroups = facts
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .groupBy("k", "__salt").count()
    // the hot key alone must occupy several shards, not one reducer key
    assert(partialGroups.filter(col("k") === "hot").count() >= 4)

    // row-position salt: N copies of the SAME row still spread (a
    // row-content hash would collapse them onto one reducer)
    val dups = df("k STRING, v BIGINT", (1 to 400).map(_ => Row("hot", 7L)))
    val spread = dups.withColumn("__salt", pmod(monotonically_increasing_id(), lit(8L)))
      .select("__salt").distinct().count()
    assert(spread >= 4, s"identical rows collapsed to $spread salt buckets")
    // and the aggregate over pure duplicates still matches plain groupBy
    val salted = Skew.saltedAggregate(dups, Seq("k"),
      Seq(Skew.SaltedAgg("sum", "v", "s"), Skew.SaltedAgg("count", "*", "n")), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == Seq(("hot", 2800L, 400L)))
  }

  test("salted inner and left joins equal their unsalted counterparts") {
    val inner = Skew.saltedJoin(facts, dim, "k", "k", buckets = 4)
    val plainInner = facts.join(dim, facts("k") === dim("k"))
    assert(inner.count() == plainInner.count())
    assert(inner.agg(sum("v")).head().getLong(0) ==
      plainInner.agg(sum("v")).head().getLong(0))

    val left = Skew.saltedJoin(facts, dim, "k", "k", buckets = 4, joinType = "left")
    val plainLeft = facts.join(dim, facts("k") === dim("k"), "left")
    assert(left.count() == plainLeft.count())
    // unmatched left keys survive with null labels, exactly once each
    assert(left.filter(col("label").isNull).count() ==
      plainLeft.filter(col("label").isNull).count())
  }

  test("non-decomposable aggregate is rejected with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(facts, Seq("k"),
        Seq(Skew.SaltedAgg("collect_list", "v", "xs")))
    }
    assert(e.getMessage.contains("not decomposable"))
  }
}
