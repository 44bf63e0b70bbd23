package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class BasketSpec extends SparkTestBase {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // 5 baskets; a in 4, b in 3, c in 2, rare in 1; {a,b} in 3, {a,c} in 2
  private def pres = df("b STRING, i STRING", Seq(
    Row("1", "a"), Row("1", "b"), Row("1", "c"),
    Row("2", "a"), Row("2", "b"),
    Row("3", "a"), Row("3", "b"), Row("3", "rare"),
    Row("4", "a"), Row("4", "c"),
    Row("5", "x"),
    Row("5", "x"))) // duplicate presence dedupes

  test("hand-computed support/confidence/lift; infrequent items pruned") {
    val out = Basket.associationRules(pres, "b", "i", minSupport = 0.4)
      .orderBy("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    // frequent items (>= 2 of 5 baskets): a(4), b(3), c(2); pairs
    // meeting the floor: {a,b}=3, {a,c}=2 ({b,c}=1 pruned)
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")))
    val ab = out.head
    assert(ab._3 == 3L && ab._4 == r6(3.0 / 5) &&
      ab._5 == r6(3.0 / 4) && ab._6 == r6(3.0 * 5 / (4.0 * 3)))
    val ca = out(3)
    assert(ca._3 == 2L && ca._5 == r6(2.0 / 2) &&
      ca._6 == r6(2.0 * 5 / (2.0 * 4)))
  }

  test("maxBasketSize drops the catch-all basket before the pair join") {
    val hot = df("b STRING, i STRING",
      (1 to 20).map(k => Row("mega", s"i$k")) ++
        Seq(Row("1", "i1"), Row("1", "i2"), Row("2", "i1"), Row("2", "i2")))
    val capped = Basket.associationRules(hot, "b", "i",
      minSupport = 0.5, maxBasketSize = Some(10))
    // mega basket gone: 2 baskets remain, {i1,i2} in both
    val rows = capped.orderBy("antecedent").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(2)).forall(_ == 2L)) // pair count sans mega
    assert(rows.map(_.getDouble(3)).forall(_ == 1.0)) // support 2/2
    // uncapped the mega basket participates: same pair now counts 3/3
    val un = Basket.associationRules(hot, "b", "i", 0.5)
      .orderBy("antecedent").collect()
    assert(un.length == 2 && un.forall(_.getLong(2) == 3L))
  }

  test("itemSimilarity: hand-computed cosine/lift; floor prunes pairs") {
    // pres fixture: 5 baskets; n_a=4, n_b=3, n_c=2; {a,b}=3, {a,c}=2,
    // {b,c}=1, {rare,*}=1
    val out = Basket.itemSimilarity(pres, "b", "i", minPairCount = 2)
      .orderBy("item", "neighbor").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out.map(t => (t._1, t._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")))
    val ab = out.head
    assert(ab._3 == 3L && ab._4 == r6(3.0 / math.sqrt(4.0 * 3.0)) &&
      ab._5 == r6(3.0 * 5 / (4.0 * 3.0)))
    val ca = out(3)
    assert(ca._3 == 2L && ca._4 == r6(2.0 / math.sqrt(2.0 * 4.0)))
  }

  test("itemSimilarity: topK keeps the cosine-nearest per item") {
    // b's neighbors: a (3/sqrt(12)=.866) beats c if c qualified; force
    // a two-neighbor item by lowering the floor to 1
    val out = Basket.itemSimilarity(pres, "b", "i",
      minPairCount = 1, topK = Some(1))
      .orderBy("item", "neighbor").collect()
      .map(r => r.getString(0) -> r.getString(1)).toSeq
    // every item keeps exactly its single best neighbor
    assert(out.count(_._1 == "a") == 1 && out.count(_._1 == "b") == 1)
    assert(out.contains("b" -> "a"))  // cosine .866 beats b-c .408
    assert(out.contains("a" -> "b"))  // .866 beats a-c .5 and a-rare
  }

  test("guards: bad params rejected, NULLs drop") {
    intercept[IllegalArgumentException] {
      Basket.associationRules(pres, "b", "i", 0.0)
    }
    intercept[IllegalArgumentException] {
      Basket.associationRules(pres, "b", "i", 0.5, Some(1))
    }
    val withNulls = df("b STRING, i STRING",
      Seq(Row(null, "a"), Row("1", null), Row("1", "a"), Row("2", "a")))
    // only 2 valid presence rows -> no pairs at all
    assert(Basket.associationRules(withNulls, "b", "i", 0.1).count() == 0)
  }
}
