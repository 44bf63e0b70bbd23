package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Data Selection via Importance Resampling (DSIR; Xie et al.,
 * NeurIPS 2023): score every raw document by how much more likely its
 * hashed n-gram features are under a small TARGET corpus (the
 * distribution you want more of — curated text, a domain, a language
 * register) than under the raw corpus itself. Sampling proportional to
 * exp(weight) then reshapes 100 TB of web crawl toward the target
 * distribution — the published recipe behind domain-targeted pretraining
 * mixes. Reference scope: the quality/selection stage of the wrangler's
 * curation flow (ui/src/App.tsx:1007-1446 stage repair feeds the same
 * filter surface); the estimator itself is from the paper.
 *
 * Features are unigram + adjacent-bigram buckets (`dsir_buckets`, an
 * engine-portable polynomial hash — NativeText.dsirBuckets), so the
 * "vocabulary" is a FIXED `buckets`-sized space: both bucket-count
 * tables are ≤ `buckets` rows no matter the corpus size. With add-α
 * smoothing over that space,
 *
 *   weight(d) = Σ_b c_b(d) · [ ln p̂_target(b) − ln p̂_raw(b) ]
 *   p̂(b)     = (count(b) + α) / (total + α·B)
 *
 * Scale shape: two map-side-combined aggregations build the bucket
 * tables (≤B rows each — AQE broadcasts them into the per-document
 * join); corpus totals ride a broadcast one-row aggregate, never a
 * driver collect. Per-(doc, bucket) contributions round to 9 dp and sum
 * as DECIMAL(20,9) — associative, so partition order can't move the
 * hash (same float-determinism policy as LmScore / Search.bm25TopK).
 * The doc-side feature aggregation is the only data-sized shuffle.
 */
object Dsir {

  /**
   * `(doc_id, n_feats, dsir_weight)` for every row of `raw` — weight
   * rounded to 6 dp; documents with no tokens get NULL weight (no
   * evidence) and n_feats 0. `target` is typically a filtered subset of
   * `raw` or a separate curated table; only its text column is read.
   */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 4096,
                        alpha: Double = 1.0): DataFrame = {
    require(buckets > 0 && alpha > 0, "buckets and alpha must be positive")

    def feats(df: DataFrame) =
      df.select(explode(
        TextFunctions.dsirBuckets(lower(col(textCol)), buckets)).as("b"))

    val tCounts = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = feats(raw).groupBy("b").agg(count(lit(1)).as("cr"))
    val totals = broadcast(
      tCounts.agg(sum("ct").cast("double").as("tt"))
        .crossJoin(rCounts.agg(sum("cr").cast("double").as("tr"))))

    val docFeats = raw
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.dsirBuckets(lower(col(textCol)), buckets))
          .as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))

    val contrib = docFeats
      .join(tCounts, Seq("b"), "left")
      .join(rCounts, Seq("b"), "left")
      .crossJoin(totals)
      .withColumn("w", round(
        col("c").cast("double") *
          (log((coalesce(col("ct"), lit(0L)) + lit(alpha)) /
               (col("tt") + lit(alpha * buckets))) -
           log((coalesce(col("cr"), lit(0L)) + lit(alpha)) /
               (col("tr") + lit(alpha * buckets)))), 9))
    val scored = contrib.groupBy("doc_id").agg(
      sum("c").as("n_feats"),
      round(sum(col("w").cast("decimal(20,9)")).cast("double"), 6)
        .as("dsir_weight"))
    raw.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
  }

  /**
   * The full bucket-weight table — one row per bucket id in [0, B),
   * including buckets observed in neither corpus (their weight is the
   * nonzero smoothing constant ln(α/(Tt+αB)) − ln(α/(Tr+αB)), so a
   * lookup never needs a missing-key path). ≤`buckets` rows by
   * construction: this is the artifact a nightly batch run persists and
   * the streaming scorer ships inline. Weights round to 9 dp.
   */
  def bucketWeights(raw: DataFrame, target: DataFrame, textCol: String,
                    buckets: Int = 4096, alpha: Double = 1.0): DataFrame = {
    def feats(df: DataFrame) =
      df.select(explode(
        TextFunctions.dsirBuckets(lower(col(textCol)), buckets)).as("b"))
    val tCounts = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val rCounts = feats(raw).groupBy("b").agg(count(lit(1)).as("cr"))
    val totals = broadcast(
      tCounts.agg(sum("ct").cast("double").as("tt"))
        .crossJoin(rCounts.agg(sum("cr").cast("double").as("tr"))))
    raw.sparkSession.range(buckets).select(col("id").cast("int").as("b"))
      .join(tCounts, Seq("b"), "left")
      .join(rCounts, Seq("b"), "left")
      .crossJoin(totals)
      .select(col("b"), round(
        log((coalesce(col("ct"), lit(0L)) + lit(alpha)) /
            (col("tt") + lit(alpha * buckets))) -
        log((coalesce(col("cr"), lit(0L)) + lit(alpha)) /
            (col("tr") + lit(alpha * buckets))), 9).as("w"))
  }

  /**
   * STREAMING-LEGAL scoring against a precomputed weight table — the
   * incremental-ingest half of DSIR: [[bucketWeights]] runs on
   * yesterday's snapshot, the (bounded, ≤B-entry) table ships as a
   * literal map, and arriving documents score in a pure projection —
   * no aggregation, no state, applies unchanged to a streaming source
   * (same inline-vs-join trade as Lines.removeLinesInline).
   *
   * The per-document sum accumulates in DECIMAL(20,9) inside the
   * `aggregate` HOF — exact and associative, so feature order cannot
   * move the result and any engine summing the same rounded weights
   * reproduces it. Docs with no features score NULL (no evidence).
   */
  def scoreWithWeights(df: DataFrame, idCol: String, textCol: String,
                       weights: Map[Int, Double],
                       buckets: Int = 4096): DataFrame = {
    require(weights.keys.forall(b => b >= 0 && b < buckets),
      "weight keys must be bucket ids in [0, buckets)")
    // Dense-array literal, indexed by bucket id: element_at on a literal
    // MAP is a linear scan of all entries per lookup (O(buckets) × features
    // × docs — measured ~6s of the gate at sf0.1); bucket ids are dense
    // [0, buckets), so a positional array lookup is O(1) with the same
    // null-for-absent semantics.
    val wlit = typedlit(
      (0 until buckets).map(b => weights.get(b).map(Double.box).orNull))
    val arr = TextFunctions.dsirBuckets(lower(col(textCol)), buckets)
    val total = aggregate(arr,
      lit(java.math.BigDecimal.ZERO).cast("decimal(20,9)"),
      (acc, b) => (acc + coalesce(element_at(wlit, b + 1), lit(0.0))
        .cast("decimal(20,9)")).cast("decimal(20,9)"))
    df.select(col(idCol).as("doc_id"),
      when(size(arr) === 0, lit(null).cast("double"))
        .otherwise(round(total.cast("double"), 6)).as("dsir_score"))
  }

  /**
   * Gumbel top-k importance resampling — DSIR's selection step: drawing
   * k documents WITHOUT replacement with probability ∝ exp(weight) is
   * exactly "add independent Gumbel(0,1) noise to each weight, keep the
   * k largest keys" (Gumbel-max trick; Vieira 2014). Deterministic and
   * engine-portable: the uniform u for each row derives from the doc id
   * through the same polynomial fold as the feature hash — u =
   * (fold(id) + 0.5) / 2000003, strictly inside (0,1) — so any engine
   * replays the identical sample. NULL-weight docs (no features) carry
   * NULL keys and sort last, never sampled.
   *
   * Scale shape: one projection over the weighted table; top-k is
   * TakeOrderedAndProject (per-partition heads + driver merge of k
   * rows), never a global sort.
   */
  def gumbelTopK(weighted: DataFrame, idCol: String, weightCol: String,
                 k: Int): DataFrame = {
    val fold = TextFunctions.dsirBuckets(col(idCol).cast("string"), 2000003)
      .getItem(0)
    val u = (fold.cast("double") + lit(0.5)) / lit(2000003.0)
    weighted
      .withColumn("gumbel_key",
        round(col(weightCol) + -log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc_nulls_last, col(idCol).asc)
      .limit(k)
  }
}
