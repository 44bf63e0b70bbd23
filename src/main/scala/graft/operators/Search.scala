package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text relevance search: BM25 top-k documents per query, computed as
 * one declarative plan over the corpus — the batch analogue of an
 * inverted-index search, used at corpus scale for "find the docs about X"
 * curation probes and hard-negative mining.
 *
 * Scoring is Lucene-shape BM25: for query term t and document d,
 *   idf(t)    = ln(1 + (N - n_t + 0.5) / (n_t + 0.5))        (always ≥ 0)
 *   w(t, d)   = idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl))
 * summed over the query's terms.
 *
 * Scale shape: token explode → two map-side-combined hash aggregations
 * (per-doc tf, corpus df) — the same inverted-index discipline as
 * [[graft.operators.Keywords]]; the query set is small by definition and
 * BROADCASTs onto tf, so only documents containing at least one query
 * term ever enter the scoring join; corpus size N and avgdl ride along as
 * a broadcast one-row aggregate (never a driver-side collect); the final
 * top-k is a per-query window over candidates only.
 *
 * Float determinism (oracle policy, cf. SparkEntry scaladoc): each term
 * contribution rounds to 9 dp and sums as DECIMAL(20,9) — exact and
 * associative, so partial aggregation order can't change the hash — then
 * the emitted score rounds to 6 dp, and the ranking orders by that SAME
 * rounded value (doc_id tiebreak) so rank and score can never disagree
 * between engines.
 */
object Search {

  /**
   * Top-k BM25 hits per query: `(query_id, rank, doc_id, score)`.
   * `queries` is `(query_id, term)` — one row per query term; repeated
   * terms in one query count once (set semantics, the common choice).
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("n_t"))
    // Corpus constants as a broadcast 1-row frame, not a collect: N counts
    // ALL documents (an empty doc is part of the corpus), avgdl averages
    // over docs that have tokens (the only ones with a length).
    val stats = broadcast(
      docs.agg(count(lit(1)).as("n"))
        .crossJoin(dl.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"))))
    val q = broadcast(queries.select(col("query_id"), col("term")).distinct())
    val contrib = tf.join(q, "term")
      .join(dfreq, "term")
      .join(dl, "doc_id")
      .crossJoin(stats)
      .withColumn("w", round(
        log(lit(1.0) + (col("n") - col("n_t") + lit(0.5)) / (col("n_t") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
        9))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(round(sum(col("w").cast("decimal(20,9)")).cast("double"), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score")
  }

  /**
   * Reciprocal-rank fusion — the standard hybrid-retrieval combiner
   * (lexical BM25 ∪ dense ANN): fused(d) = Σ_sys 1/(k0 + rank_sys(d)),
   * summing only over systems that returned d. Rank-based, so the two
   * systems' incommensurable score scales never need calibration;
   * k0 = 60 is the conventional damping.
   *
   * Inputs are two `(query_id, rank, doc_id)` ranked lists (any extra
   * columns ignored). Scale shape: both inputs are already top-k-per-
   * query (k·|queries| rows — the expensive part happened upstream);
   * the fusion is one full-outer join on (query_id, doc_id) and a
   * per-query window over ≤ 2k candidates. Determinism: 1/(k0+rank) is
   * the same IEEE division in any engine, the two-term sum has a fixed
   * order, and ties break on doc_id.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10,
              k0: Int = 60): DataFrame = {
    val an = a.select(col("query_id"), col("doc_id"), col("rank").as("__ra"))
    val bn = b.select(col("query_id"), col("doc_id"), col("rank").as("__rb"))
    val fused = an.join(bn, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(k0.toDouble) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("__rb")), lit(0.0)), 9))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf")
  }
}
