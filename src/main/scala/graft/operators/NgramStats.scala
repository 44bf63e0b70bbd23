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
}
