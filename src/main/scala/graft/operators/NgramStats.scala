package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level n-gram frequency statistics — the classic "count every
 * n-gram in the corpus" job (language-model data analysis, boilerplate
 * discovery, contamination screening).
 *
 * Shape at 100 TB: explode → hash-aggregate. The explode multiplies rows
 * by ~tokens-per-doc, but partial aggregation (map-side combine) collapses
 * each partition's counts before the single shuffle, so network volume is
 * bounded by DISTINCT n-grams per partition, not total n-gram occurrences.
 * The top-k step is a global sort of the (much smaller) aggregate — Spark
 * executes `orderBy.limit` as per-partition top-k + driver merge
 * (TakeOrderedAndProject), never a full sort.
 */
object NgramStats {

  /** (ngram, n_occurrences) for every word n-gram, lowercased.
    * `minCount` prunes the long tail before it reaches the caller. */
  def ngramCounts(df: DataFrame, textCol: String, n: Int,
                  minCount: Long = 1L): DataFrame = {
    // native one-pass shingle builder — the wordShingles HOF formulation
    // is value-identical (spec-pinned) but evaluates interpreted, ~5×
    // slower end-to-end on the corpus-stats path
    val grams = df
      .select(explode(
        TextFunctions.stringShingles(lower(col(textCol)), n)).as("ngram"))
      .filter(length(col("ngram")) > 0)
    grams.groupBy("ngram")
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
  }

  /** Deterministic top-k n-grams: count DESC, ngram ASC. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    ngramCounts(df, textCol, n)
      .orderBy(col("n_occurrences").desc, col("ngram").asc)
      .limit(k)

  /**
   * PMI collocation mining (Church & Hanks, 1990): adjacent token pairs
   * that co-occur far more than their unigram frequencies predict —
   * multi-word entities and set phrases ("hong kong", "per capita").
   * pmi(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with p(a,b) over the bigram
   * total and p(·) over the token total.
   *
   * Scale shape: both count tables are map-side-combined aggregations
   * (network bounded by distinct grams, not occurrences); `minCount`
   * prunes the bigram tail BEFORE the two vocabulary-sized unigram
   * joins (AQE broadcasts the unigram table when it fits); totals ride
   * a broadcast one-row aggregate. Top-k is TakeOrderedAndProject,
   * never a full sort. The PMI expression is one double product chain,
   * identically parenthesized in the DuckDB oracle, rounded to 6 dp.
   */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5L, k: Int = 100): DataFrame = {
    val uni = ngramCounts(df, textCol, 1)
      .select(col("ngram").as("w"), col("n_occurrences").as("cu"))
    // stringShingles emits one whole-doc fallback shingle for docs
    // shorter than n tokens; true bigrams contain exactly one space,
    // the 1-token fallback none — filter it out.
    val big = df
      .select(explode(
        TextFunctions.stringShingles(lower(col(textCol)), 2)).as("ngram"))
      .filter(col("ngram").contains(" "))
      .groupBy("ngram").agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minCount)
      .select(split(col("ngram"), " ").getItem(0).as("w1"),
        split(col("ngram"), " ").getItem(1).as("w2"), col("c_pair"))
    val totals = broadcast(
      uni.agg(sum("cu").cast("double").as("n_tok"))
        .crossJoin(df.select(explode(TextFunctions.stringShingles(
            lower(col(textCol)), 2)).as("g"))
          .filter(col("g").contains(" "))
          .agg(count(lit(1)).cast("double").as("n_big"))))
    val scored = big
      .join(uni.select(col("w").as("w1"), col("cu").as("ca")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("cb")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("c_pair"),
        round(log(col("c_pair").cast("double") * col("n_tok") * col("n_tok") /
          (col("n_big") * col("ca") * col("cb"))), 6).as("pmi"))
    scored
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /**
   * Zipf-law fit over the top-k token frequencies — the corpus-health
   * audit: natural text follows freq ∝ rank^(−s) with s ≈ 1; a slope
   * far off (or a poor fit) flags templated/machine-generated text,
   * aggressive dedup artifacts, or heavy boilerplate. Least squares on
   * (x, y) = (ln rank, ln freq): one row
   * `(n_terms, slope, intercept, r2)` (slope reported as the POSITIVE
   * Zipf exponent s, 6 dp).
   *
   * FP determinism: each term contributes 9-dp-rounded x, y, xy, x²,
   * y² values summed as DECIMAL(25,9) (associative), and the closed-
   * form slope/intercept/r² are fixed-shape double expressions over
   * those exact sums — the [[graft.operators.Drift]] policy.
   *
   * Scale shape: one term-count aggregate, a deterministic top-k
   * (TakeOrderedAndProject — never a full sort), and a k-row reduce.
   */
  def zipfFit(df: DataFrame, textCol: String, k: Int = 1000): DataFrame = {
    // bounded-window: topk — ranks the k-row topVocabulary result
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_occurrences").desc, col("term").asc)
    val ranked = Vocab.topVocabulary(df, textCol, k)
      .withColumn("__x", round(log(row_number().over(w).cast("double")), 9))
      .withColumn("__y", round(log(col("n_occurrences").cast("double")), 9))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(25,9)")
    val sums = ranked.agg(
      count(lit(1)).as("n"),
      sum(dec(col("__x"))).cast("double").as("sx"),
      sum(dec(col("__y"))).cast("double").as("sy"),
      sum(dec(round(col("__x") * col("__y"), 9))).cast("double").as("sxy"),
      sum(dec(round(col("__x") * col("__x"), 9))).cast("double").as("sxx"),
      sum(dec(round(col("__y") * col("__y"), 9))).cast("double").as("syy"))
    sums.select(col("n").as("n_terms"),
      round(-(col("sxy") - col("sx") * col("sy") / col("n")) /
        (col("sxx") - col("sx") * col("sx") / col("n")), 6).as("slope"),
      round((col("sy") - (col("sxy") - col("sx") * col("sy") / col("n")) /
        (col("sxx") - col("sx") * col("sx") / col("n")) * col("sx")) /
        col("n"), 6).as("intercept"),
      round(
        ((col("sxy") - col("sx") * col("sy") / col("n")) *
          (col("sxy") - col("sx") * col("sy") / col("n"))) /
          ((col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("syy") - col("sy") * col("sy") / col("n"))), 6).as("r2"))
  }

  /**
   * N-gram novelty vs a reference corpus — the memorization/freshness
   * audit: per document, the share of its DISTINCT word n-grams never
   * seen in `reference` (novelty 0 ⇒ fully reconstructible from the
   * reference n-gram inventory; 1 ⇒ entirely new surface forms). One
   * row per corpus document: `(idCol, n_shingles, n_novel, novelty)`,
   * documents too short for any n-gram kept with (0, 0, NULL).
   *
   * Scale shape: both sides reduce to 8-byte xxhash64 shingles (the
   * [[graft.operators.Dedup]] discipline — set membership over 64-bit
   * hashes equals string membership up to ~2⁻⁶⁴ collisions); the
   * reference's DISTINCT shingle set is shuffle-joined on the hash, NOT
   * broadcast — at 100 TB the reference inventory is itself huge, and a
   * shingle-keyed sort-merge/hash join partitions both sides. Per-doc
   * counts map-side-combine on the doc id.
   */
  def novelty(corpus: DataFrame, reference: DataFrame, idCol: String,
              textCol: String, refTextCol: String, n: Int): DataFrame = {
    val refSh = reference
      .select(explode(TextFunctions.hashedShingleSet(col(refTextCol), n)).as("sh"))
      .distinct()
      .withColumn("__seen", lit(1))
    val docSh = corpus
      .select(col(idCol), explode(
        TextFunctions.hashedShingleSet(col(textCol), n)).as("sh"))
    val perDoc = docSh.join(refSh, Seq("sh"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("__seen").isNull, 1)).as("n_novel"))
    corpus.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6)
          .as("novelty"))
  }
}
