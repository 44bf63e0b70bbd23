package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Unigram language-model scoring — the CCNet-style "how natural is this
 * text" quality signal: train token counts on a reference corpus, score
 * each document by its mean token negative log-likelihood under the
 * add-α smoothed unigram model. Low NLL ≈ in-distribution text; high ≈
 * gibberish, boilerplate, or wrong-language — the standard perplexity
 * bucketing used to tier web corpora (a real KenLM is 5-gram Kneser-Ney;
 * the plumbing and the bucketing decision are identical).
 *
 *   p(t) = (c(t) + α) / (T + α·(V + 1))      (+1: the unseen-token mass)
 *   nll(d) = − Σ_i ln p(t_i) / |d|
 *
 * Scale shape: the model IS a DataFrame (term → count) built with one
 * map-side-combined aggregation over the reference corpus; scoring joins
 * each document's per-term tf against it on the term key — vocabulary-
 * sized, so AQE picks broadcast when it fits and a key-shuffle when it
 * doesn't (never forced) — with corpus totals (T, V) riding a broadcast
 * one-row aggregate, never a driver collect. Unseen tokens keep their
 * document rows through a LEFT join (c = 0). Per-(doc, term)
 * contributions round to 9 dp and sum as DECIMAL(20,9) — associative, so
 * partition order can't move the hash (same policy as Search.bm25TopK).
 */
object LmScore {

  /**
   * Score `docs` under a unigram model trained on `train`:
   * `(doc_id, n_tokens, nll)` — `nll` rounded to 6 dp; documents with no
   * tokens get NULL nll (no evidence, not "perfect").
   */
  def unigramNll(train: DataFrame, trainTextCol: String,
                 docs: DataFrame, idCol: String, textCol: String,
                 alpha: Double = 0.5): DataFrame = {
    def toks(df: DataFrame, c: String, out: String) =
      df.select(col(out), explode(split(trim(lower(col(c))), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)

    val counts = toks(train.select(lit(1L).as("__one"), col(trainTextCol)),
        trainTextCol, "__one")
      .groupBy("term").agg(count(lit(1)).as("c"))
    val stats = broadcast(counts.agg(
      sum("c").cast("double").as("t_total"),
      count(lit(1)).cast("double").as("v")))

    val tf = toks(docs.select(col(idCol).as("doc_id"), col(textCol)),
        textCol, "doc_id")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val contrib = tf
      .join(counts, Seq("term"), "left")
      .crossJoin(stats)
      .withColumn("w", round(
        -col("tf") * log((coalesce(col("c"), lit(0L)) + lit(alpha)) /
          (col("t_total") + lit(alpha) * (col("v") + lit(1.0)))), 9))
    val scored = contrib.groupBy("doc_id").agg(
      sum("tf").as("n_tokens"),
      round((sum(col("w").cast("decimal(20,9)")).cast("double") / sum("tf")), 6)
        .as("nll"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
  }

  /**
   * CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): per
   * LANGUAGE, rank documents by LM score and cut into `buckets`
   * equal-size tiers — bucket 1 = most in-distribution ("head"), last =
   * "tail". Per-language cuts matter because raw NLL is not comparable
   * across languages (different token entropy); CCNet keeps head+middle
   * and drops or down-weights tail.
   *
   * Scale shape: scoring is [[unigramNll]]; the tier cut is one window
   * per language partition — `ntile` needs a per-language sort, and
   * languages are a bounded partition key (skew toward big languages is
   * real; at the 100 TB regime sub-salt the window by a hash bucket and
   * re-merge, or cut by approx quantiles instead — documented knob).
   * NULL-NLL docs (no tokens) sort LAST on both engines (explicit
   * NULLS LAST — Spark's asc default is nulls-first, DuckDB's is
   * nulls-last; left unpinned this is a silent cross-engine divergence).
   * Ties break on doc_id, so the cut is deterministic.
   */
  def perplexityBuckets(train: DataFrame, trainTextCol: String,
                        docs: DataFrame, idCol: String, textCol: String,
                        langCol: String, buckets: Int = 3,
                        alpha: Double = 0.5): DataFrame = {
    val scored = unigramNll(train, trainTextCol, docs, idCol, textCol, alpha)
    docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"))
      .join(scored, Seq("doc_id"))
      .withColumn("bucket", ntile(buckets).over(
        Window.partitionBy("lang")
          .orderBy(col("nll").asc_nulls_last, col("doc_id").asc)))
  }
}
