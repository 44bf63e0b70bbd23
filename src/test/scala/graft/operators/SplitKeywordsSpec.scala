package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class SplitKeywordsSpec extends SparkTestBase {

  test("hashSplit: deterministic, content-keyed, frac-monotone") {
    val docs = df("id INT, text STRING", (1 to 200).map(i => Row(i, s"document number $i")))
    val a = Split.hashSplit(docs, "text", 0.8).collect().map(r => (r.getInt(0), r.getString(2))).toMap
    val b = Split.hashSplit(docs, "text", 0.8).collect().map(r => (r.getInt(0), r.getString(2))).toMap
    assert(a == b) // deterministic across runs
    val trainFrac = a.values.count(_ == "train").toDouble / a.size
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"got $trainFrac") // ~0.8 ± noise
    // duplicates land on the same side regardless of id (content-keyed)
    val dups = df("id INT, text STRING", Seq(Row(1, "same text"), Row(2, "same text")))
    assert(Split.hashSplit(dups, "text", 0.5).select("split").distinct().count() == 1L)
    // frac 0 / 1 are total
    assert(Split.hashSplit(docs, "text", 0.0).filter(col("split") === "train").count() == 0L)
    assert(Split.hashSplit(docs, "text", 1.0).filter(col("split") === "test").count() == 0L)
  }

  test("groupSplit: whole groups stay on one side, even with differing content") {
    val chunks = df("id INT, domain STRING, text STRING",
      (1 to 100).flatMap(i => (0 until 3).map(c =>
        Row(i * 10 + c, s"site$i.example", s"chunk $c of site $i"))))
    val out = Split.groupSplit(chunks, "domain", 0.5)
    // exactly one split value per group — no sibling leakage
    val perGroup = out.groupBy("domain")
      .agg(countDistinct("split").as("k"))
      .filter(col("k") =!= 1L).count()
    assert(perGroup == 0L)
    // and it is NOT the content split: content-keyed would scatter chunks
    val contentScatter = Split.hashSplit(chunks, "text", 0.5)
      .groupBy("domain").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1L).count()
    assert(contentScatter > 0L)
  }

  test("hashSplit3 nests with hashSplit: growing 2-way to 3-way never moves train") {
    val docs = df("id INT, text STRING", (1 to 200).map(i => Row(i, s"document number $i")))
    val two = Split.hashSplit(docs, "text", 0.8)
      .filter(col("split") === "train").select("id").collect().map(_.getInt(0)).toSet
    val three = Split.hashSplit3(docs, "text", 0.8, 0.1)
      .collect().map(r => (r.getInt(0), r.getString(2)))
    assert(three.filter(_._2 == "train").map(_._1).toSet == two)
    val counts = three.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // val+test of the 3-way == test of the 2-way
    assert(counts("val") + counts("test") == 200 - two.size)
    intercept[IllegalArgumentException] {
      Split.hashSplit3(docs, "text", 0.8, 0.3).collect()
    }
  }

  test("topTerms ranks by (tf desc, df asc, term asc) with single-char tokens dropped") {
    val docs = df("id INT, text STRING", Seq(
      Row(1, "apple apple banana cherry x"),
      Row(2, "banana banana cherry"),
      Row(3, "cherry date date date")))
    val out = Keywords.topTerms(docs, "id", "text", k = 2)
      .orderBy("doc_id", "rnk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      // doc 1: apple tf=2; banana/cherry tie at tf=1 → banana (df 2) ranks
      // above cherry (df 3), but k=2 keeps only apple+banana
      (1, 1L, "apple", 2L, 1L),
      (1, 2L, "banana", 1L, 2L),
      (2, 1L, "banana", 2L, 2L),
      (2, 2L, "cherry", 1L, 3L),
      (3, 1L, "date", 3L, 1L),
      (3, 2L, "cherry", 1L, 3L)))
    assert(!out.exists(_._3 == "x")) // single-char dropped
  }

  test("connectedComponents labels every node with its component minimum") {
    // two components: {1,2,3} chained (not a clique) and {10,11}; plus
    // a long path {20..24} to exercise multi-round propagation
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(
      Row(1L, 2L), Row(2L, 3L),
      Row(10L, 11L),
      Row(20L, 21L), Row(21L, 22L), Row(22L, 23L), Row(23L, 24L)))
    val out = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L))
  }

  test("connectedComponentsStar agrees with min-label on mixed components") {
    val pairs = df("id_a BIGINT, id_b BIGINT", Seq(
      Row(1L, 2L), Row(2L, 3L),
      Row(10L, 11L),
      Row(20L, 21L), Row(21L, 22L), Row(22L, 23L), Row(23L, 24L),
      Row(30L, 30L))) // self-loop: node still labeled, own component
    val star = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val minLabel = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == minLabel)
    assert(star(30L) == 30L)
  }

  test("connectedComponentsStar closes a 1000-node path in O(log d) rounds") {
    val spark2 = spark
    import spark2.implicits._
    val n = 1000L
    val pairs = spark.range(1L, n)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // maxIter=12 ≪ diameter 999: only the O(log d) algorithm fits
    val out = Dedup.connectedComponentsStar(pairs, maxIter = 12)
    assert(out.count() == n)
    val comps = out.select("comp").distinct().as[Long].collect().toSeq
    assert(comps == Seq(1L))
  }

  test("connectedComponents escalates to star contraction past maxIter") {
    val spark2 = spark
    import spark2.implicits._
    val n = 200L
    val pairs = spark.range(1L, n)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // diameter 199 ≫ maxIter 5: min-label alone cannot converge; the
    // escalation must still produce the exact component minimum
    val out = Dedup.connectedComponents(pairs, maxIter = 5)
    assert(out.count() == n)
    assert(out.select("comp").distinct().as[Long].collect().toSeq == Seq(1L))
    // and the partial work is composed correctly: every node labeled 1
    val bad = out.filter(col("comp") =!= 1L).count()
    assert(bad == 0L)
  }

  test("temporalSplit: day-granular cutoff at the trainFrac row quantile") {
    import org.apache.spark.sql.Row
    // 3 days with 2/3/5 rows; frac 0.5 of 10 -> rank 5 -> cutoff day 2
    val rows = Seq.tabulate(10) { i =>
      val day = if (i < 2) 1 else if (i < 5) 2 else 3
      Row(i.toLong, java.sql.Timestamp.valueOf(f"2024-01-0$day%d 0$i%02d:00:00"))
    }
    val d = df("id BIGINT, ts TIMESTAMP", rows)
    val out = Split.temporalSplit(d, "ts", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (0 until 5).foreach(i => assert(out(i.toLong) == "train"))
    (5 until 10).foreach(i => assert(out(i.toLong) == "test"))
    // whole days move together: frac 0.3 of 10 -> rank 3 -> inside day 2,
    // so ALL of day 2 is train (overshoot, never a split day)
    val out2 = Split.temporalSplit(d, "ts", 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (0 until 5).foreach(i => assert(out2(i.toLong) == "train"))
    (5 until 10).foreach(i => assert(out2(i.toLong) == "test"))
  }

  test("temporalSplit: train never postdates test") {
    import org.apache.spark.sql.Row
    val rows = Seq.tabulate(30) { i =>
      Row(i.toLong, java.sql.Timestamp.valueOf(
        f"2024-02-${i % 10 + 1}%02d 12:00:00"))
    }
    val out = Split.temporalSplit(df("id BIGINT, ts TIMESTAMP", rows), "ts", 0.7)
    val maxTrain = out.filter(col("split") === "train")
      .agg(org.apache.spark.sql.functions.max("ts")).collect()(0).getTimestamp(0)
    val minTest = out.filter(col("split") === "test")
      .agg(org.apache.spark.sql.functions.min("ts")).collect()(0).getTimestamp(0)
    assert(maxTrain.before(minTest))
  }

  test("logOddsTerms: exclusive frequent terms top the z ranking; prior shrinks rare ones") {
    import org.apache.spark.sql.Row
    val d = df("text STRING, cls STRING", Seq(
      Row("hola hola hola mundo mundo shared shared", "es"),
      Row("hola hola raro shared shared", "es"),
      Row("hello hello hello world shared shared", "en"),
      Row("hello world world shared shared", "en")))
    val out = Keywords.logOddsTerms(d, "text", "cls", "es", k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // es-exclusive terms have positive z, en-exclusive negative,
    // balanced 'shared' ~0
    assert(out("hola")._3 > 0 && out("mundo")._3 > 0)
    assert(out("hello")._3 < 0 && out("world")._3 < 0)
    assert(math.abs(out("shared")._3) < 0.3)
    // frequency beats rarity under the prior: hola (5) > raro (1)
    assert(out("hola")._3 > out("raro")._3 && out("raro")._3 > 0)
    // counts faithful
    assert(out("hola")._1 == 5L && out("hola")._2 == 0L)
  }

  test("kFold: folds in range, stable across calls, k must divide 16") {
    import org.apache.spark.sql.Row
    val d = df("id BIGINT, key STRING",
      (1L to 64L).map(i => Row(i, s"content-$i")))
    val a = Split.kFold(d, "key", k = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(a.values.forall(f => f >= 0 && f < 4))
    assert(a.values.toSet.size == 4) // 64 keys hit all 4 folds w.h.p.
    val b = Split.kFold(d, "key", k = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(a == b) // content-keyed: stable across runs
    // k=8 refines k=4: a key's 8-fold value mod 4 = its 4-fold value?
    // NOT guaranteed by nibble%k (8 and 4 both divide 16: nibble%8%4 ==
    // nibble%4 holds arithmetically) — assert the nesting
    val e8 = Split.kFold(d, "key", k = 8).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(d.collect().forall { r =>
      e8(r.getLong(0)) % 4 == a(r.getLong(0))
    })
    intercept[IllegalArgumentException] {
      Split.kFold(d, "key", k = 3)
    }
  }

  test("trainingOrder: deterministic (shard, position) independent of input partitioning") {
    import spark.implicits._
    val d = (0L until 200L).toDF("id")
    val a = Split.trainingOrder(d, "id", nShards = 4).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    // same content, radically different partitioning → identical order
    val b = Split.trainingOrder(d.repartition(17), "id", nShards = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a == b)
    // positions are contiguous 1..|shard| within every shard
    a.values.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1L to rows.size).toSeq)
    }
    // hash sharding is balanced in expectation: no empty shard at n=200
    assert(a.values.map(_._1).toSet == Set(0, 1, 2, 3))
    // a different seed is a different permutation
    val c = Split.trainingOrder(d, "id", nShards = 4, seed = "other")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(c != a)
    // the order is NOT the id order (it actually shuffles)
    val shard0 = a.toSeq.filter(_._2._1 == a(0L)._1).sortBy(_._2._2).map(_._1)
    assert(shard0 != shard0.sorted)
    intercept[IllegalArgumentException] {
      Split.trainingOrder(d, "id", nShards = 300)
    }
  }
}
