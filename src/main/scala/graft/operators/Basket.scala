package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Market-basket association-rule mining over (basket, item) presence
 * rows — "users who touched X also touched Y" for curation (co-occurring
 * tags/sources/domains) and product analytics. A-Priori pruned to the
 * pairwise level: only items meeting the support floor enter the pair
 * join, and only pairs meeting it again become rules.
 *
 * Scale shape: presence dedup is ONE (basket, item) shuffle; the pair
 * generator is a basket-keyed self-join whose per-basket cost is
 * |basket|² — bounded by BOTH the frequent-item prune and the explicit
 * `maxBasketSize` guard (the [[Linkage]] `maxBlockSize` / [[Dedup]]
 * `maxShingleFreq` discipline: a degenerate catch-all basket cannot go
 * quadratic unannounced); pair counts map-side combine into the
 * item-pair domain, never back into baskets.
 *
 * Determinism: counts are exact; support/confidence/lift are single
 * IEEE-double expressions with a fixed operand order, published at
 * 6 dp. The support floor compares in DOUBLE space
 * (`n ≥ minSupport · nBaskets` both sides as doubles) — exact-integer
 * boundary cases follow IEEE multiplication, identically cross-engine.
 */
object Basket {

  private def d(c: Column): Column = c.cast("double")

  /**
   * Pairwise association rules. Input rows are (basket, item)
   * observations (duplicates fine — presence is deduped; NULL basket
   * or item drops). Emits one row per ordered rule A⇒B over unordered
   * frequent pairs: `(antecedent, consequent, pair_count, support,
   * confidence, lift)`.
   *
   * @param minSupport    support floor as a fraction of baskets,
   *                      applied to items AND pairs (A-Priori)
   * @param maxBasketSize drop baskets whose RAW distinct-item count
   *                      exceeds this, BEFORE frequent-item pruning —
   *                      the skew guard for the quadratic pair step.
   *                      Deliberate: a catch-all basket (bot session,
   *                      default bucket) is pathological regardless of
   *                      which of its items survive the support floor,
   *                      and capping pre-prune keeps the guard a single
   *                      pass that also bounds the support-count step.
   */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minSupport: Double,
                       maxBasketSize: Option[Long] = None): DataFrame = {
    require(minSupport > 0.0 && minSupport <= 1.0,
      s"minSupport must be in (0, 1], got $minSupport")
    val pres0 = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).cast("string").as("__b"),
        col(itemCol).cast("string").as("__i"))
      .distinct()
    val pres = maxBasketSize match {
      case Some(cap) =>
        require(cap >= 2, s"maxBasketSize must be >= 2, got $cap")
        val hot = pres0.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
          .where(col("__sz") > cap).select(col("__b"))
        pres0.join(hot, Seq("__b"), "left_anti")
      case None => pres0
    }
    val nB = pres.agg(countDistinct(col("__b")).as("__nb"))
    val itemCounts = pres.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val frequent = itemCounts.crossJoin(nB)
      .where(d(col("__ni")) >= lit(minSupport) * d(col("__nb")))
      .select(col("__i"))
    val pruned = pres.join(frequent, Seq("__i"), "left_semi")
    val pairs = pruned.select(col("__b"), col("__i").as("__ia"))
      .join(pruned.select(col("__b"), col("__i").as("__ib")), Seq("__b"))
      .where(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib")).agg(count(lit(1)).as("__np"))
      .crossJoin(nB)
      .where(d(col("__np")) >= lit(minSupport) * d(col("__nb")))
    val both = pairs
      .select(col("__ia").as("__ante"), col("__ib").as("__cons"),
        col("__np"), col("__nb"))
      .unionAll(pairs.select(col("__ib").as("__ante"),
        col("__ia").as("__cons"), col("__np"), col("__nb")))
    both
      .join(itemCounts.select(col("__i"), col("__ni").as("__na")),
        col("__ante") === col("__i")).drop("__i")
      .join(itemCounts.select(col("__i"), col("__ni").as("__nc")),
        col("__cons") === col("__i")).drop("__i")
      .select(
        col("__ante").as("antecedent"), col("__cons").as("consequent"),
        col("__np").as("pair_count"),
        round(d(col("__np")) / d(col("__nb")), 6).as("support"),
        round(d(col("__np")) / d(col("__na")), 6).as("confidence"),
        round(d(col("__np")) * d(col("__nb")) /
          (d(col("__na")) * d(col("__nc"))), 6).as("lift"))
  }

  /**
   * Item-item co-occurrence similarity — the classic neighborhood
   * recommender table ("users who touched X also touched Y, ranked"):
   * for each surviving item, its co-items with `cosine =
   * n_xy / √(n_x·n_y)` over basket presence and `lift =
   * n_xy·N / (n_x·n_y)`. Rows are DIRECTED `(item, neighbor,
   * pair_count, cosine, lift)` — each unordered pair appears once per
   * direction — so `topK` can keep the k nearest neighbors per item
   * (rank by published cosine desc, pair_count desc, neighbor asc:
   * a total, engine-independent order).
   *
   * Scale shape: same presence-dedup + basket-keyed self-join as
   * [[associationRules]] with the same `maxBasketSize` skew guard;
   * `minPairCount` floors the pair table BEFORE the per-item window,
   * and the topK window partitions by item — no global sort.
   *
   * Determinism: counts exact; cosine/lift are fixed-operand-order
   * IEEE expressions (√ is correctly rounded) published at 6 dp.
   */
  def itemSimilarity(df: DataFrame, basketCol: String, itemCol: String,
                     minPairCount: Long = 1,
                     maxBasketSize: Option[Long] = None,
                     topK: Option[Int] = None): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val pres0 = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).cast("string").as("__b"),
        col(itemCol).cast("string").as("__i"))
      .distinct()
    val pres = maxBasketSize match {
      case Some(cap) =>
        require(cap >= 2, s"maxBasketSize must be >= 2, got $cap")
        val hot = pres0.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
          .where(col("__sz") > cap).select(col("__b"))
        pres0.join(hot, Seq("__b"), "left_anti")
      case None => pres0
    }
    val nB = pres.agg(countDistinct(col("__b")).as("__nb"))
    val itemCounts = pres.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = pres.select(col("__b"), col("__i").as("__ia"))
      .join(pres.select(col("__b"), col("__i").as("__ib")), Seq("__b"))
      .where(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib")).agg(count(lit(1)).as("__np"))
      .where(col("__np") >= minPairCount)
    val directed = pairs
      .select(col("__ia").as("item"), col("__ib").as("neighbor"), col("__np"))
      .unionAll(pairs.select(col("__ib").as("item"),
        col("__ia").as("neighbor"), col("__np")))
      .join(itemCounts.select(col("__i"), col("__ni").as("__na")),
        col("item") === col("__i")).drop("__i")
      .join(itemCounts.select(col("__i"), col("__ni").as("__nn")),
        col("neighbor") === col("__i")).drop("__i")
      .crossJoin(broadcast(nB))
      .select(col("item"), col("neighbor"),
        col("__np").as("pair_count"),
        round(d(col("__np")) /
          sqrt(d(col("__na")) * d(col("__nn"))), 6).as("cosine"),
        round(d(col("__np")) * d(col("__nb")) /
          (d(col("__na")) * d(col("__nn"))), 6).as("lift"))
    topK match {
      case Some(k) =>
        require(k >= 1, s"topK must be >= 1, got $k")
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("item"))
          .orderBy(col("cosine").desc, col("pair_count").desc,
            col("neighbor").asc)
        directed.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= k).drop("__rn")
      case None => directed
    }
  }
}
