package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
   * Moore–Lewis cross-entropy difference selection (Moore & Lewis, ACL
   * 2010) — the classic domain-data filter: score each document by
   * `H_target(d) − H_general(d)` under two add-α unigram models, one
   * trained on the in-domain corpus and one on the general pool. Low
   * (negative) scores are documents the TARGET model likes more than
   * the general one — "looks in-domain, not just generically fluent";
   * select ascending. Output `(doc_id, n_tokens, ce_diff)`; NULL when
   * the document has no tokens.
   *
   * Scale shape: exactly two [[unigramNll]] passes (each one
   * vocabulary-keyed count model + a tf join) and a doc-keyed join of
   * the two score frames — nothing beyond the parts already proven,
   * same determinism policy end-to-end.
   */
  def mooreLewis(target: DataFrame, general: DataFrame,
                 trainTextCol: String, docs: DataFrame, idCol: String,
                 textCol: String, alpha: Double = 0.5): DataFrame = {
    val t = unigramNll(target, trainTextCol, docs, idCol, textCol, alpha)
      .select(col("doc_id"), col("n_tokens"), col("nll").as("__t"))
    val g = unigramNll(general, trainTextCol, docs, idCol, textCol, alpha)
      .select(col("doc_id"), col("nll").as("__g"))
    t.join(g, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("__t") - col("__g"), 6).as("ce_diff"))
  }

  /**
   * Interpolated Kneser-Ney BIGRAM scoring (Kneser & Ney, ICASSP 1995;
   * Chen & Goodman, 1999 — the model family behind KenLM, which CCNet
   * uses at 5-gram order): unlike the unigram model, KN scores a token
   * by how PREDICTABLE it is from its left neighbor, and its famous
   * continuation probability ranks a word by how many distinct contexts
   * it follows ("francisco" is frequent but only ever follows "san" —
   * KN correctly scores it useless as a generic continuation).
   *
   *   p(w2|w1) = ( max(c(w1w2) − D, 0) + D·N1+(w1·)·N1+(·w2)/N1+(··) )
   *              / c(w1·)
   *
   * with fixed discount D = 0.75, N1+ = distinct-neighbor counts and
   * c(w1·) the bigram-context total. Documents score mean −ln p over
   * their adjacent interior token pairs; docs with < 2 tokens get NULL
   * (no bigram evidence). Unseen events (w1 never a context, or a
   * continuation mass of zero) floor at 1/(V+1) — the documented OOV
   * fallback, unreachable when scoring the training corpus itself.
   *
   * Scale shape: the model is three count DataFrames (bigram types,
   * per-context totals + distinct-continuation counts, per-word
   * distinct-context counts), all map-side-combined aggregations keyed
   * by vocabulary-sized keys; scoring joins each document's bigram tf
   * against them (AQE broadcast when they fit), with the two scalar
   * totals riding a broadcast one-row aggregate. Per-(doc, bigram)
   * contributions round to 9 dp and sum as DECIMAL(20,9) — the same
   * float-determinism policy as [[unigramNll]].
   */
  def knBigramNll(train: DataFrame, trainTextCol: String,
                  docs: DataFrame, idCol: String, textCol: String,
                  discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")

    def bigrams(df: DataFrame, key: Column, out: String, tcol: String) = df
      .select(key.as(out), explode(graft.functions.TextFunctions
        .stringShingles(lower(col(tcol)), 2)).as("g"))
      .filter(col("g").contains(" "))
      .select(col(out), split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"))

    val c12 = bigrams(train, lit(1L), "__one", trainTextCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // per-context totals and distinct continuations, one pass over c12
    val ctx = c12.groupBy("w1").agg(
      sum("c12").as("c1"), count(lit(1)).as("n1fw"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1bw"))
    val totals = broadcast(
      c12.agg(count(lit(1)).cast("double").as("nbig"))
        .crossJoin(train.select(explode(graft.functions.TextFunctions
            .stringShingles(lower(col(trainTextCol)), 1)).as("t"))
          .filter(length(col("t")) > 0)
          .agg(countDistinct(col("t")).cast("double").as("v"))))

    val tf = bigrams(docs.select(col(idCol).as("doc_id"), col(textCol)),
        col("doc_id"), "doc_id", textCol)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
    val p = tf
      .join(c12, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(totals)
      .withColumn("p0",
        (greatest(coalesce(col("c12"), lit(0L)).cast("double") -
            lit(discount), lit(0.0)) +
          lit(discount) * coalesce(col("n1fw"), lit(0L)) *
            coalesce(col("n1bw"), lit(0L)) / col("nbig")) /
          col("c1").cast("double"))
      .withColumn("p",
        when(col("p0").isNull || col("p0") === 0.0,
          lit(1.0) / (col("v") + lit(1.0))).otherwise(col("p0")))
      .withColumn("w", round(-col("tf") * log(col("p")), 9))
    val scored = p.groupBy("doc_id").agg(
      sum("tf").as("n_bigrams"),
      round((sum(col("w").cast("decimal(20,9)")).cast("double") /
        sum("tf")), 6).as("kn_nll"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
  }

  /**
   * Interpolated Kneser-Ney TRIGRAM scoring — one order up from
   * [[knBigramNll]], the next step toward KenLM's 5-gram (Chen &
   * Goodman 1999 recursion, fixed discount D at every level):
   *
   *   p(w3|w1w2) = (max(c(w1w2w3) − D, 0) + D·N1+(w1w2·)·p_mid(w3|w2))
   *                / c(w1w2·)
   *   p_mid(w3|w2) = (max(N1+(·w2w3) − D, 0) + D·N1+mid(w2·)·p_cont(w3))
   *                / N1+(·w2·)
   *   p_cont(w3)  = N1+(··w3) / N1+(···)
   *
   * All lower-order quantities are CONTINUATION (type) counts derived
   * from the trigram type table — the Chen-Goodman prescription for
   * interior levels (the bottom level here also derives from trigram
   * types rather than a separate bigram pass; self-consistent, and the
   * difference is only at document edges). Documents score mean −ln p
   * over interior trigram occurrences; docs with < 3 tokens get NULL.
   * Unseen events floor at 1/(V+1) as in the bigram model — unreachable
   * when scoring the training corpus itself.
   *
   * Scale shape: the model is four vocabulary-keyed count DataFrames,
   * every one a map-side-combined aggregation of the trigram type
   * table (itself one corpus scan through the codegen'd shingle
   * expression); scoring joins per-(doc, trigram) tf against them (AQE
   * broadcast when they fit) with the two scalar totals on a broadcast
   * one-row frame. Same 9-dp/DECIMAL(20,9) determinism policy as
   * [[knBigramNll]].
   */
  def knTrigramNll(train: DataFrame, trainTextCol: String,
                   docs: DataFrame, idCol: String, textCol: String,
                   discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "discount must be in (0,1)")
    val d = lit(discount)

    def trigrams(df: DataFrame, key: Column, out: String, tcol: String) = df
      .select(key.as(out), explode(graft.functions.TextFunctions
        .stringShingles(lower(col(tcol)), 3)).as("g"))
      .filter(size(split(col("g"), " ")) === 3)
      .select(col(out), split(col("g"), " ").getItem(0).as("w1"),
        split(col("g"), " ").getItem(1).as("w2"),
        split(col("g"), " ").getItem(2).as("w3"))

    val c123 = trigrams(train, lit(1L), "__one", trainTextCol)
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val ctx12 = c123.groupBy("w1", "w2").agg(
      sum("c123").as("c12dot"), count(lit(1)).as("n1fw12"))
    val t23 = c123.groupBy("w2", "w3").agg(count(lit(1)).as("ct23"))
    val mid = t23.groupBy("w2").agg(
      sum("ct23").as("t2dot"), count(lit(1)).as("n1fw2"))
    val cont = t23.groupBy("w3").agg(count(lit(1)).as("n1bw3"))
    val totals = broadcast(
      t23.agg(count(lit(1)).cast("double").as("nbt"))
        .crossJoin(train.select(explode(graft.functions.TextFunctions
            .stringShingles(lower(col(trainTextCol)), 1)).as("t"))
          .filter(length(col("t")) > 0)
          .agg(countDistinct(col("t")).cast("double").as("v"))))

    val tf = trigrams(docs.select(col(idCol).as("doc_id"), col(textCol)),
        col("doc_id"), "doc_id", textCol)
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("tf"))
    val p = tf
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(t23, Seq("w2", "w3"), "left")
      .join(mid, Seq("w2"), "left")
      .join(cont, Seq("w3"), "left")
      .crossJoin(totals)
      .withColumn("pm",
        (greatest(coalesce(col("ct23"), lit(0L)).cast("double") - d,
            lit(0.0)) +
          d * coalesce(col("n1fw2"), lit(0L)) *
            (coalesce(col("n1bw3"), lit(0L)) / col("nbt"))) /
          col("t2dot").cast("double"))
      .withColumn("p0",
        (greatest(coalesce(col("c123"), lit(0L)).cast("double") - d,
            lit(0.0)) +
          d * coalesce(col("n1fw12"), lit(0L)) * col("pm")) /
          col("c12dot").cast("double"))
      .withColumn("p",
        when(col("p0").isNull || col("p0") === 0.0,
          lit(1.0) / (col("v") + lit(1.0))).otherwise(col("p0")))
      .withColumn("w", round(-col("tf") * log(col("p")), 9))
    val scored = p.groupBy("doc_id").agg(
      sum("tf").as("n_trigrams"),
      round((sum(col("w").cast("decimal(20,9)")).cast("double") /
        sum("tf")), 6).as("kn3_nll"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_trigrams", coalesce(col("n_trigrams"), lit(0L)))
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
