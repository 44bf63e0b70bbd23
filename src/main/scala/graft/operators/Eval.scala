package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dataset-evaluation metrics for curation pipelines: ranked-retrieval
 * quality (recall@k / MRR@k / nDCG@k — Järvelin & Kekäläinen 2002) and
 * inter-rater agreement (Cohen's κ, 1960). Both are the audit half of
 * operators that already exist here: `rankedRetrieval` scores one
 * retriever (BM25, ANN) against another's top-k as gold — the lexical-vs-
 * dense agreement diagnostic behind hybrid fusion tuning — and
 * `cohenKappa` quantifies whether two labeling heuristics (quality
 * raters, language IDs, toxicity tags) agree beyond chance before either
 * is trusted to filter a corpus.
 *
 * Float determinism: every fractional metric follows the repo convention
 * (SparkEntry decimal-sum policy) — per-term DCG contributions round to
 * 9 dp and accumulate in DECIMAL(20,9) (exact, order-independent, so any
 * engine summing the same rounded terms agrees), divisions happen once on
 * exact operands, and final outputs round to 6 dp.
 *
 * Scale shape: `rankedRetrieval` joins two already-top-k tables
 * (k·|queries| rows each — the expensive retrieval happened upstream), so
 * every shuffle is bounded by k·|queries| regardless of corpus size.
 * `cohenKappa` reduces the corpus to a confusion-cell table in ONE
 * map-side-combining aggregate (|labels|² cells cross the wire, not
 * rows); the marginal products are computed on the cells.
 */
object Eval {

  /**
   * Per-query ranked-retrieval quality of `results` against `gold`.
   *
   * `results`: ranked candidates `(queryCol, docCol, rankCol)` (rank
   * 1-based; rows with rank > k are ignored). `gold`: the relevant set
   * per query (any ranking ignored; duplicates collapse). One output row
   * per gold query, zeros where the retriever found nothing:
   * `(query_id, n_gold, hits, recall_at_k, mrr_at_k, ndcg_at_k)` —
   * recall@k = hits/|gold|, MRR@k = 1/first-relevant-rank, nDCG@k with
   * binary gains: DCG = Σ_hits 1/log2(rank+1) against the ideal prefix
   * Σ_{i≤min(k,|gold|)} 1/log2(i+1).
   */
  def rankedRetrieval(results: DataFrame, gold: DataFrame,
                      queryCol: String, docCol: String, rankCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val r = results.filter(col(rankCol) <= k)
      .select(col(queryCol).as("query_id"), col(docCol).as("__d"),
        col(rankCol).cast("long").as("__rk"))
    val g = gold
      .select(col(queryCol).as("query_id"), col(docCol).as("__d"))
      .distinct()
    val nGold = g.groupBy("query_id").agg(count(lit(1)).as("n_gold"))
    val perQ = r.join(g, Seq("query_id", "__d"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("__hits"),
        min(col("__rk")).as("__first"),
        sum(round(lit(1.0) / log2(col("__rk").cast("double") + lit(1.0)), 9)
          .cast("decimal(20,9)")).as("__dcg"))
    // ideal DCG: sequential fold over 1..min(k, n_gold) of the same
    // 9-dp-rounded terms — decimal accumulation, so term order is moot
    val idcg = aggregate(
      sequence(lit(1L), least(lit(k.toLong), col("n_gold"))),
      lit(java.math.BigDecimal.ZERO).cast("decimal(20,9)"),
      (acc, i) => (acc + round(lit(1.0) / log2(i.cast("double") + lit(1.0)), 9)
        .cast("decimal(20,9)")).cast("decimal(20,9)"))
    nGold.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"), col("n_gold"),
        coalesce(col("__hits"), lit(0L)).as("hits"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") /
          col("n_gold").cast("double"), 6).as("recall_at_k"),
        when(col("__first").isNull, lit(0.0))
          .otherwise(round(lit(1.0) / col("__first").cast("double"), 6))
          .as("mrr_at_k"),
        when(col("__dcg").isNull, lit(0.0))
          .otherwise(round(
            col("__dcg").cast("double") / idcg.cast("double"), 6))
          .as("ndcg_at_k"))
  }

  /**
   * Fleiss' κ (1971) — agreement among a FIXED number of raters per item,
   * in long form: one `(itemCol, labelCol)` row per individual rating.
   * Items with a rating count ≠ `nRaters` are dropped (the classic
   * formulation requires a constant panel; partial items would silently
   * bias P̄), NULL labels are excluded before counting. One output row:
   * `(n_items, observed_agreement, chance_agreement, kappa)` with
   * P̄ = Σ_i(Σ_j n_ij² − n) / (N·n·(n−1)), P̄_e = Σ_j p_j², κ as usual;
   * NULL κ when P̄_e = 1.
   *
   * Scale shape: ratings reduce to (item, label) cells in one
   * map-side-combining aggregate; everything after is per-item/per-label
   * sums of exact integers — the only doubles are the three final
   * divisions, rounded to 6 dp.
   */
  def fleissKappa(df: DataFrame, itemCol: String, labelCol: String,
                  nRaters: Int): DataFrame = {
    require(nRaters >= 2, "nRaters must be >= 2")
    val n = lit(nRaters.toLong)
    val cells = df
      .select(col(itemCol).as("i"), col(labelCol).cast("string").as("l"))
      .filter(col("l").isNotNull)
      .groupBy("i", "l").agg(count(lit(1)).as("nij"))
    val perItem = cells.groupBy("i")
      .agg(sum(col("nij")).as("ni"),
        sum(col("nij") * col("nij")).as("sq"))
      .filter(col("ni") === n)
    val agg = perItem.agg(count(lit(1)).as("n_items"),
      sum(col("sq") - n).as("agree_num"))
    val cat = cells.join(perItem.select(col("i")), Seq("i"))
      .groupBy("l").agg(sum(col("nij")).as("cj"))
      .agg(sum(col("cj") * col("cj")).as("cj2"))
    val nItems = col("n_items").cast("double")
    val nd = n.cast("double")
    val pBar = col("agree_num").cast("double") /
      (nItems * nd * (nd - lit(1.0)))
    val pE = col("cj2").cast("double") / ((nItems * nd) * (nItems * nd))
    agg.crossJoin(cat)
      .select(col("n_items"),
        round(pBar, 6).as("observed_agreement"),
        round(pE, 6).as("chance_agreement"),
        when(pE === lit(1.0), lit(null).cast("double"))
          .otherwise(round((pBar - pE) / (lit(1.0) - pE), 6)).as("kappa"))
  }

  /**
   * Krippendorff's α (nominal data) — the agreement coefficient that
   * tolerates VARIABLE raters per item and missing ratings, where
   * Fleiss requires a fixed panel. Long form `(itemCol, labelCol)`, one
   * row per rating; items with fewer than 2 ratings aren't pairable and
   * drop (Krippendorff 2004). α = 1 − D_o/D_e with
   * D_o = (1/n)·Σ_i Σ_c n_ic(m_i − n_ic)/(m_i − 1) and
   * D_e = (n² − Σ_c n_c²)/(n(n−1)) over the n pairable ratings.
   * α is NULL when D_e = 0 (every rating one label — undefined).
   *
   * Determinism: the only non-integer intermediate is each item's
   * disagreement term, which rounds to 9 dp and accumulates as DECIMAL
   * (order-independent); category products run in DECIMAL so n² cannot
   * overflow a long at corpus scale; the final divisions are fixed-shape
   * IEEE ops rounded to 6 dp. Scale shape: same as [[fleissKappa]] —
   * one map-side-combining reduce to (item, label) cells, everything
   * after on cell/marginal tables.
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
                        labelCol: String): DataFrame = {
    val cells = df
      .select(col(itemCol).as("i"), col(labelCol).cast("string").as("l"))
      .filter(col("l").isNotNull)
      .groupBy("i", "l").agg(count(lit(1)).as("nij"))
    val items = cells.groupBy("i").agg(sum(col("nij")).as("mi"))
      .filter(col("mi") >= 2)
    val pair = cells.join(items, Seq("i"))
    val obs = pair.agg(
      sum(round((col("nij") * (col("mi") - col("nij"))).cast("double") /
            (col("mi") - lit(1L)).cast("double"), 9)
        .cast("decimal(28,9)")).as("__do"))
    val tot = items.agg(sum(col("mi")).as("n"),
      count(lit(1)).as("n_items"))
    val cat = pair.groupBy("l").agg(sum(col("nij")).as("nc"))
      .agg(sum(col("nc").cast("decimal(38,0)") * col("nc")).as("__nc2"))
    val nD = col("n").cast("decimal(38,0)")
    val doAvg = col("__do").cast("double") / col("n").cast("double")
    val de = (nD * nD - col("__nc2")).cast("double") /
      (nD * (nD - lit(1))).cast("double")
    tot.crossJoin(obs).crossJoin(cat)
      .select(col("n_items"), col("n"),
        round(doAvg, 6).as("observed_disagreement"),
        round(de, 6).as("expected_disagreement"),
        when(de === lit(0.0), lit(null).cast("double"))
          .otherwise(round(lit(1.0) - doAvg / de, 6)).as("alpha"))
  }

  /**
   * Cohen's κ between two categorical label columns: one row
   * `(n, agree, observed_agreement, chance_agreement, kappa)` where
   * κ = (p_o − p_e)/(1 − p_e), p_e = Σ_c p(A=c)·p(B=c). Rows where
   * either label is NULL are excluded (no judgment to compare). κ is
   * NULL when p_e = 1 (both raters constant and identical — undefined).
   *
   * One corpus pass: partial (a,b)-cell counts combine map-side; totals,
   * the agreement diagonal, and the marginal products all derive from
   * the tiny cell table. Counts are exact longs; the two divisions and
   * the κ ratio are single IEEE ops on exact operands (engine-portable),
   * rounded to 6 dp.
   */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val cells = df
      .select(col(raterA).cast("string").as("a"),
        col(raterB).cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    val tot = cells.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(lit(0L))).as("agree"))
    val ma = cells.groupBy("a").agg(sum(col("c")).as("na"))
    val mb = cells.groupBy("b").agg(sum(col("c")).as("nb"))
    // only labels both raters ever used contribute to pe (others × 0);
    // disjoint vocabularies → empty join → p_e = 0, not NULL
    val chance = ma.join(mb, col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("prod"))
    val po = col("agree").cast("double") / col("n").cast("double")
    val pe = col("prod").cast("double") /
      (col("n").cast("double") * col("n").cast("double"))
    tot.crossJoin(chance)
      .select(col("n"), col("agree"),
        round(po, 6).as("observed_agreement"),
        round(pe, 6).as("chance_agreement"),
        when(pe === lit(1.0), lit(null).cast("double"))
          .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Whitespace tokens with empty strings dropped — `split(trim(''))`
    * yields `[""]`, which would count as a phantom token on blank rows. */
  private def toks(c: Column): Column =
    filter(split(trim(coalesce(c, lit(""))), "\\s+"), t => t =!= "")

  /**
   * Token-level generation eval (SQuAD-style): per `(pred, gold)` row,
   * bag-of-tokens overlap WITH multiplicity and the derived
   * precision / recall / F1 plus whitespace-normalized exact match:
   * `(id, n_pred, n_gold, overlap, precision, recall, f1, exact_match)`.
   * F1 = 2·overlap/(n_pred+n_gold) (the algebraic identity with
   * 2PR/(P+R), defined even when one side is empty); precision/recall
   * are NULL when their denominator is 0 (nothing predicted / no gold —
   * masking as 0 would hide "empty output" vs "all wrong").
   *
   * Scale shape: a PURE PROJECTION — the clipped overlap is the native
   * hash-count expression [[graft.functions.ClippedOverlap]] over the
   * two token bags of the SAME row (O(|pred| + |gold|) per row, not the
   * O(L²) filter-scan), so the plan has zero shuffles and the corpus
   * never moves (r9 exploded to (id, token) cells and shuffled every
   * token three times for an identical Σ min count). Counts are exact
   * longs; the three ratios are single divisions rounded to 6 dp.
   */
  def tokenF1(df: DataFrame, idCol: String,
              predCol: String, goldCol: String): DataFrame = {
    import graft.functions.{TextFunctions => TFN}
    val base = df.select(col(idCol).as("id"),
      toks(col(predCol)).as("__pt"), toks(col(goldCol)).as("__gt"),
      regexp_replace(trim(coalesce(col(predCol), lit(""))), "\\s+", " ")
        .as("__pn"),
      regexp_replace(trim(coalesce(col(goldCol), lit(""))), "\\s+", " ")
        .as("__gn"))
    base.select(col("id"),
        size(col("__pt")).cast("long").as("n_pred"),
        size(col("__gt")).cast("long").as("n_gold"),
        coalesce(TFN.clippedOverlap(col("__pt"), col("__gt")), lit(0L))
          .as("overlap"),
        col("__pn"), col("__gn"))
      .select(col("id"), col("n_pred"), col("n_gold"), col("overlap"),
        when(col("n_pred") > 0,
          round(col("overlap").cast("double") / col("n_pred"), 6))
          .as("precision"),
        when(col("n_gold") > 0,
          round(col("overlap").cast("double") / col("n_gold"), 6))
          .as("recall"),
        when(col("n_pred") + col("n_gold") > 0,
          round(lit(2.0) * col("overlap") /
            (col("n_pred") + col("n_gold")).cast("double"), 6))
          .as("f1"),
        (col("__pn") === col("__gn")).cast("int").as("exact_match"))
  }

  /** Contiguous n-grams of a token array as space-joined strings
    * (tokens are whitespace-split, so ' ' cannot occur inside one). */
  private def grams(tokArr: Column, n: Int): Column =
    when(size(tokArr) >= n,
      transform(sequence(lit(1), size(tokArr) - lit(n - 1)),
        i => concat_ws(" ", slice(tokArr, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /**
   * ROUGE-N (Lin 2004) per `(pred, gold)` row: clipped n-gram overlap
   * with multiplicity and the derived precision / recall / F1 —
   * `(id, n_pred_ngrams, n_gold_ngrams, overlap, precision, recall,
   * f1)`. ROUGE proper is the RECALL column (how much of the reference
   * the candidate covers — the summarization-eval convention); the
   * precision/F1 columns make the table double as a per-row BLEU-n
   * diagnostic. NULL ratios where the denominator side has no n-grams
   * (too-short text is undefined, not zero); F1 =
   * 2·overlap/(n_pred+n_gold), defined when either side has mass.
   *
   * Scale shape: a PURE PROJECTION — same native clipped-overlap
   * expression as [[tokenF1]], applied to the two same-row n-gram
   * arrays: zero shuffles, the corpus' n-grams never cross the network
   * (r9 shuffled every n-gram three times through (id, gram) cells for
   * the identical Σ min count).
   */
  def rougeN(df: DataFrame, idCol: String, predCol: String,
             goldCol: String, n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 8, "n must be in [1, 8]")
    import graft.functions.{TextFunctions => TFN}
    val base = df.select(col(idCol).as("id"),
      grams(toks(col(predCol)), n).as("__pg"),
      grams(toks(col(goldCol)), n).as("__gg"))
    base.select(col("id"),
        size(col("__pg")).cast("long").as("n_pred_ngrams"),
        size(col("__gg")).cast("long").as("n_gold_ngrams"),
        coalesce(TFN.clippedOverlap(col("__pg"), col("__gg")), lit(0L))
          .as("overlap"))
      .select(col("id"), col("n_pred_ngrams"), col("n_gold_ngrams"),
        col("overlap"),
        when(col("n_pred_ngrams") > 0,
          round(col("overlap").cast("double") / col("n_pred_ngrams"), 6))
          .as("precision"),
        when(col("n_gold_ngrams") > 0,
          round(col("overlap").cast("double") / col("n_gold_ngrams"), 6))
          .as("recall"),
        when(col("n_pred_ngrams") + col("n_gold_ngrams") > 0,
          round(lit(2.0) * col("overlap") /
            (col("n_pred_ngrams") + col("n_gold_ngrams")).cast("double"), 6))
          .as("f1"))
  }

  /**
   * ROUGE-L (Lin 2004) per `(pred, gold)` row: longest common
   * SUBSEQUENCE of the token streams — in-order matches that need not
   * be contiguous, the summarization-eval signal n-gram overlap can't
   * express (a reordered summary scores high on ROUGE-1 but low here).
   * Output `(id, n_pred, n_gold, lcs, precision, recall, f1)` with
   * precision = lcs/n_pred, recall = lcs/n_gold (each NULL when its
   * side is empty), F1 = 2·lcs/(n_pred+n_gold).
   *
   * Scale shape: a PURE PROJECTION — the LCS is a native rolling-DP
   * codegen'd expression ([[graft.functions.LcsLength]]), so the plan
   * has zero shuffles and the corpus never moves. The O(L_pred·L_gold)
   * cost is per-row arithmetic inside whole-stage codegen; cap document
   * token lengths upstream (Chunk) if pairs can reach 10⁵×10⁵.
   */
  def rougeL(df: DataFrame, idCol: String, predCol: String,
             goldCol: String): DataFrame = {
    import graft.functions.{TextFunctions => TFN}
    val base = df.select(col(idCol).as("id"),
      toks(col(predCol)).as("__pt"), toks(col(goldCol)).as("__gt"))
      .select(col("id"),
        size(col("__pt")).cast("long").as("n_pred"),
        size(col("__gt")).cast("long").as("n_gold"),
        TFN.lcsLength(col("__pt"), col("__gt")).as("lcs"))
    base.select(col("id"), col("n_pred"), col("n_gold"), col("lcs"),
      when(col("n_pred") > 0,
        round(col("lcs").cast("double") / col("n_pred"), 6)).as("precision"),
      when(col("n_gold") > 0,
        round(col("lcs").cast("double") / col("n_gold"), 6)).as("recall"),
      when(col("n_pred") + col("n_gold") > 0,
        round(lit(2.0) * col("lcs") /
          (col("n_pred") + col("n_gold")).cast("double"), 6)).as("f1"))
  }

  /**
   * Word error rate over PRE-TOKENIZED hypothesis/reference arrays:
   * `(id, n_ref, n_hyp, edits, wer)` with `edits` the word-level
   * Levenshtein distance (unit-cost substitution/insertion/deletion —
   * the S+I+D numerator) and WER = edits/n_ref, NULL on an empty
   * reference (undefined, not 0; the edits column still reports the
   * |hyp| pure insertions). Caller chooses the token granularity —
   * words for ASR WER, chars for CER, BPE pieces for model-space TER.
   *
   * Scale shape: a PURE PROJECTION — the DP is the native rolling-DP
   * codegen'd [[graft.functions.TokenEditDistance]], zero shuffle, the
   * corpus never moves; O(|hyp|·|ref|) per-row arithmetic inside
   * whole-stage codegen (cap transcript lengths upstream via Chunk if
   * pairs can reach 10⁵×10⁵ tokens).
   */
  def tokenErrorRate(df: DataFrame, idCol: String,
                     hypToksCol: String, refToksCol: String): DataFrame = {
    import graft.functions.{TextFunctions => TFN}
    df.select(col(idCol).as("id"),
        size(col(refToksCol)).cast("long").as("n_ref"),
        size(col(hypToksCol)).cast("long").as("n_hyp"),
        TFN.tokenEditDistance(col(hypToksCol), col(refToksCol)).as("edits"))
      .select(col("id"), col("n_ref"), col("n_hyp"), col("edits"),
        when(col("n_ref") > 0,
          round(col("edits").cast("double") / col("n_ref"), 6)).as("wer"))
  }

  /** Standard whitespace-token WER of hypothesis strings against
    * references — [[tokenErrorRate]] over the shared Eval tokenizer. */
  def wordErrorRate(df: DataFrame, idCol: String,
                    hypCol: String, refCol: String): DataFrame =
    tokenErrorRate(
      df.select(col(idCol), toks(col(hypCol)).as("__ht"),
        toks(col(refCol)).as("__rt")),
      idCol, "__ht", "__rt")

  /** Pool a [[tokenErrorRate]] / [[wordErrorRate]] table to corpus
    * WER, one row: `(n_pairs, ref_tokens, edits, wer)` with
    * WER = Σedits/Σ|ref| — the standard pooled definition (empty-ref
    * rows still contribute their insertion edits to the numerator). */
  def poolErrorRate(rates: DataFrame): DataFrame =
    rates
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("n_ref")).as("ref_tokens"),
        sum(col("edits")).as("edits"))
      .select(col("n_pairs"), col("ref_tokens"), col("edits"),
        when(col("ref_tokens") > 0,
          round(col("edits").cast("double") / col("ref_tokens"), 6))
          .as("wer"))

  /** Corpus whitespace-token WER of hypothesis strings vs references. */
  def corpusWer(df: DataFrame, idCol: String,
                hypCol: String, refCol: String): DataFrame =
    poolErrorRate(wordErrorRate(df, idCol, hypCol, refCol))

  /**
   * Corpus-level BLEU (Papineni et al. 2002) of `predCol` against a
   * single reference `goldCol`: one row
   * `(pred_len, ref_len, p_1..p_{maxN}, brevity_penalty, bleu)` with
   * clipped modified n-gram precisions p_n = Σ_rows min(count_pred,
   * count_gold) / Σ_rows pred-n-gram-count pooled over the corpus,
   * BP = min(1, e^(1−ref_len/pred_len)), and
   * BLEU = BP·exp(Σ_n ln(p_n)/maxN) — 0 when any p_n is 0 (the
   * unsmoothed corpus definition; with corpus-pooled counts a zero
   * p_4 means literally no 4-gram matched anywhere).
   *
   * Float discipline: p_n rounds to 9 dp before the log (so both
   * engines take ln of identical doubles), ln/exp are single fixed-
   * shape libm calls, outputs round to 6 dp — the same contract the
   * nDCG gate has held across engines. Scale shape: ONE corpus pass —
   * per row, every order's clipped match count is the native
   * [[graft.functions.ClippedOverlap]] over the same-row n-gram arrays
   * (r9 ran maxN explode-reduce rounds, re-scanning the corpus 3·maxN+1
   * times and shuffling every n-gram), and all 2·maxN+2 sums reduce in
   * one aggregate; the 1-row result is checkpointed so the maxN-row
   * unpivot and the stats/precision subtrees never re-run the scan.
   */
  def corpusBleu(df: DataFrame, idCol: String, predCol: String,
                 goldCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, "maxN must be in [1, 8]")
    import graft.functions.{TextFunctions => TFN}
    import graft.plans.Checkpoints.LineageOps
    val base = df.select(col(idCol).as("id"),
      toks(col(predCol)).as("__pt"), toks(col(goldCol)).as("__gt"))
    val sums = (1 to maxN).flatMap { n =>
      Seq(
        sum(coalesce(TFN.clippedOverlap(grams(col("__pt"), n),
          grams(col("__gt"), n)), lit(0L))).as(s"__m$n"),
        sum(greatest(size(col("__pt")).cast("long") - lit(n - 1L),
          lit(0L))).as(s"__t$n"))
    } ++ Seq(
      sum(size(col("__pt")).cast("long")).as("pred_len"),
      sum(size(col("__gt")).cast("long")).as("ref_len"))
    val onePass = base.agg(sums.head, sums.tail: _*)
      .truncateLineage(eager = true)
    val lens = onePass.select(col("pred_len"), col("ref_len"))
    val perN = onePass
      .select(explode(array((1 to maxN).map(n =>
        struct(lit(n).as("n"),
          coalesce(col(s"__m$n"), lit(0L)).as("matched"),
          coalesce(col(s"__t$n"), lit(0L)).as("total"))): _*)).as("__r"))
      .select(col("__r.n").as("n"), col("__r.matched").as("matched"),
        col("__r.total").as("total"))
    // p_n rounded to 9 dp BEFORE ln so both engines log identical values
    val pn = round(col("matched").cast("double") /
      col("total").cast("double"), 9)
    val stats = perN.agg(
      sum(when(col("matched") === 0 || col("total") === 0, lit(1))
        .otherwise(lit(0))).as("__zeros"),
      sum(when(col("matched") > 0 && col("total") > 0,
        round(log(pn) / lit(maxN.toDouble), 9).cast("decimal(20,9)"))
        .otherwise(lit(java.math.BigDecimal.ZERO).cast("decimal(20,9)")))
        .as("__logsum"))
    val precCols = (1 to maxN).map(n => first(
      when(col("n") === n && col("total") > 0,
        round(col("matched").cast("double") / col("total"), 6)),
      ignoreNulls = true).as(s"p_$n"))
    val precs = perN.agg(precCols.head, precCols.tail: _*)
    val bp = when(col("pred_len") >= col("ref_len") || col("pred_len") === 0,
      lit(1.0))
      .otherwise(round(exp(lit(1.0) - col("ref_len").cast("double") /
        col("pred_len").cast("double")), 9))
    lens.crossJoin(precs).crossJoin(stats)
      .select((col("pred_len") +: col("ref_len") +:
        (1 to maxN).map(n => col(s"p_$n"))) :+
        round(bp, 6).as("brevity_penalty") :+
        when(col("__zeros") > 0 || col("pred_len") === 0, lit(0.0))
          .otherwise(round(bp * exp(col("__logsum").cast("double")), 6))
          .as("bleu"): _*)
  }

  /**
   * Corpus chrF (Popović 2015, the chrF2 configuration): character
   * n-gram F-β over whitespace-stripped text, orders 1..`maxN` (6), the
   * MT/generation metric robust to tokenization and morphology where
   * word-level BLEU is brittle. Per order: corpus-pooled clipped
   * matches give P_n = Σmin/Σpred-grams and R_n = Σmin/Σgold-grams;
   * P and R macro-average the orders WITH MASS (a zero-total order is
   * skipped, not counted as zero — the effective-order convention);
   * chrF_β = (1+β²)·P·R/(β²·P+R), β = 2 (recall-weighted). One row:
   * `(pred_chars, gold_chars, precision, recall, chrf)`.
   *
   * Unicode note: "character" = UTF-16 code unit on the Spark side and
   * codepoint in the DuckDB oracle — identical for BMP text; documents
   * beyond the BMP would need a codepoint split on the Spark side.
   *
   * Float discipline: per-order ratios round to 9 dp, macro-averages
   * divide DECIMAL sums as double (rounded 9 dp), the F-β is one fixed-
   * shape expression rounded to 6 dp. Scale shape: ONE corpus pass —
   * per row, every order's clipped match count is the native
   * [[graft.functions.ClippedOverlap]] over the same-row char-gram
   * arrays (r9 ran maxN explode-reduce rounds keyed by (id, gram),
   * re-scanning the corpus 3·maxN+1 times and shuffling ≈ corpus bytes
   * per order); all 3·maxN+2 sums reduce in one aggregate whose 1-row
   * result is checkpointed before the per-order unpivot.
   */
  def corpusChrF(df: DataFrame, idCol: String, predCol: String,
                 goldCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, "maxN must be in [1, 10]")
    require(beta > 0, "beta must be positive")
    import graft.functions.{TextFunctions => TFN}
    import graft.plans.Checkpoints.LineageOps
    def stripped(c: Column): Column =
      regexp_replace(coalesce(c, lit("")), "\\s+", "")
    val base = df.select(col(idCol).as("id"),
      stripped(col(predCol)).as("__p"), stripped(col(goldCol)).as("__g"))
    def charGrams(c: Column, n: Int): Column =
      when(length(c) >= n,
        transform(sequence(lit(1), length(c) - lit(n - 1)),
          i => c.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    val sums = (1 to maxN).flatMap { n =>
      Seq(
        sum(coalesce(TFN.clippedOverlap(charGrams(col("__p"), n),
          charGrams(col("__g"), n)), lit(0L))).as(s"__m$n"),
        sum(greatest(length(col("__p")).cast("long") - lit(n - 1L),
          lit(0L))).as(s"__tp$n"),
        sum(greatest(length(col("__g")).cast("long") - lit(n - 1L),
          lit(0L))).as(s"__tg$n"))
    } ++ Seq(
      sum(length(col("__p")).cast("long")).as("pred_chars"),
      sum(length(col("__g")).cast("long")).as("gold_chars"))
    val onePass = base.agg(sums.head, sums.tail: _*)
      .truncateLineage(eager = true)
    val perN = onePass
      .select(explode(array((1 to maxN).map(n =>
        struct(lit(n).as("n"),
          coalesce(col(s"__m$n"), lit(0L)).as("matched"),
          coalesce(col(s"__tp$n"), lit(0L)).as("tp"),
          coalesce(col(s"__tg$n"), lit(0L)).as("tg"))): _*)).as("__r"))
      .select(col("__r.n").as("n"), col("__r.matched").as("matched"),
        col("__r.tp").as("tp"), col("__r.tg").as("tg"))
    val dec = "decimal(20,9)"
    val stats = perN.agg(
      sum(when(col("tp") > 0,
        round(col("matched").cast("double") / col("tp"), 9).cast(dec)))
        .as("__psum"),
      sum(when(col("tp") > 0, lit(1))).as("__pn"),
      sum(when(col("tg") > 0,
        round(col("matched").cast("double") / col("tg"), 9).cast(dec)))
        .as("__rsum"),
      sum(when(col("tg") > 0, lit(1))).as("__rn"))
    val lens = onePass.select(col("pred_chars"), col("gold_chars"))
    val p = round(col("__psum").cast("double") / col("__pn"), 9)
    val r = round(col("__rsum").cast("double") / col("__rn"), 9)
    val b2 = lit(beta * beta)
    lens.crossJoin(stats)
      .select(col("pred_chars"), col("gold_chars"),
        when(col("__pn").isNotNull, round(p, 6)).as("precision"),
        when(col("__rn").isNotNull, round(r, 6)).as("recall"),
        when(col("__pn").isNotNull && col("__rn").isNotNull &&
          (b2 * p + r) > 0,
          round((lit(1.0) + b2) * p * r / (b2 * p + r), 6))
          .otherwise(when(col("__pn").isNotNull && col("__rn").isNotNull,
            lit(0.0)))
          .as("chrf"))
  }

  /**
   * AUC-ROC of a scorer against binary labels — the threshold-free
   * ranking audit of a quality/toxicity classifier (classificationReport
   * grades ONE threshold; AUC grades them all): the Mann-Whitney
   * formulation with AVERAGE ranks on ties,
   * AUC = (Σ_pos rank̄ − P(P+1)/2) / (P·N). One row:
   * `(n_pos, n_neg, auc)`; NULL when either class is absent. Rows with
   * NULL score or label are excluded.
   *
   * Scale shape: the corpus reduces to per-score cells `(score, n,
   * n_pos)` in one map-side-combining aggregate (scores are ROUNDED
   * to 6 dp first — a pure tie discipline: quantization merges ties
   * and average ranks absorb the merge exactly); the cumulative rank
   * walk runs over the cell table through [[graft.plans.CumWalk]],
   * partition-parallel even for an UNCALIBRATED wide-range scorer
   * (logits, BM25) whose 6-dp cell table approaches corpus size.
   * Ranks are exact integers ×2 (half-ranks doubled to stay
   * integral); the single division happens once, rounded to 6 dp.
   */
  def aucRoc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val cells = df
      .select(round(col(scoreCol).cast("double"), 6).as("s"),
        col(labelCol).cast("boolean").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("n"),
        sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("np"))
    // distributed strict-predecessor count over the cell table
    // (CumWalk — partition-parallel even for an uncalibrated
    // wide-range scorer whose cell table approaches corpus size)
    // avg rank of a tie group ×2 = 2·cumBefore + n + 1 (kept integral)
    val ranked = graft.plans.CumWalk.walk(cells, "s", asc = true,
        Seq(graft.plans.CumWalk.CumSum("n", "__b0", inclusive = false)))
      .withColumn("__before", coalesce(col("__b0"), lit(0L)))
      .withColumn("__r2", lit(2L) * col("__before") + col("n") + lit(1L))
    ranked.agg(
        sum("np").as("n_pos"),
        sum(col("n") - col("np")).as("n_neg"),
        sum(col("np") * col("__r2")).as("__s2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__s2").cast("double") / 2.0 -
            col("n_pos").cast("double") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .as("auc"))
  }

  /**
   * Reliability-diagram bins for a [0,1]-calibrated scorer: fixed-width
   * probability bins, each with its count, mean predicted score, and
   * observed positive rate — plus the bin's weighted calibration gap,
   * whose sum over bins IS the Expected Calibration Error. One row per
   * NON-EMPTY bin: `(bin, n, avg_score, pos_rate, ece_term)`; scores
   * are clamped into [0, 1] (bin nBins-1 takes 1.0).
   *
   * Scale shape: one corpus pass to nBins cells with map-side combine;
   * mean scores accumulate 6-dp-rounded values in DECIMAL (exact),
   * ratios are single divisions rounded to 6 dp.
   */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val s = least(greatest(round(col(scoreCol).cast("double"), 6),
      lit(0.0)), lit(1.0))
    val cells = df
      .select(s.as("__s"), col(labelCol).cast("boolean").as("y"))
      .filter(col("__s").isNotNull && col("y").isNotNull)
      .select(least(floor(col("__s") * nBins), lit(nBins - 1L)).cast("int")
        .as("bin"), col("__s"), col("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        sum(col("__s").cast("decimal(20,9)")).as("__ss"),
        sum(when(col("y"), lit(1L)).otherwise(lit(0L))).as("__np"))
    val total = cells.agg(sum("n").as("__t"))
    cells.crossJoin(total)
      .select(col("bin"), col("n"),
        round(col("__ss").cast("double") / col("n"), 6).as("avg_score"),
        round(col("__np").cast("double") / col("n"), 6).as("pos_rate"),
        round((col("n").cast("double") / col("__t")) *
          abs(round(col("__ss").cast("double") / col("n"), 6) -
            round(col("__np").cast("double") / col("n"), 6)), 6)
          .as("ece_term"))
  }

  /**
   * Split-conformal calibration (Vovk et al.; Papadopoulos 2002): from
   * a CALIBRATION set of nonconformity scores (higher = worse), the
   * finite-sample threshold q̂ = the ⌈(n+1)(1−α)⌉-th smallest score —
   * predictions on fresh data with score ≤ q̂ then miscover at most α
   * (exchangeability assumed). One row: `(n_cal, rank, threshold,
   * n_test, coverage)` where `coverage` is the TEST set's empirical
   * fraction at or under the threshold (the sanity check that should
   * land near 1−α). `threshold` is NULL when the rank exceeds n_cal
   * (α too small for the calibration size — the honest "no finite
   * guarantee" answer, not a fabricated max).
   *
   * Scale shape: both sides reduce to 6-dp score VALUE CELLS
   * (map-side combined — the [[aucRoc]] tie discipline); the order
   * statistic is a [[graft.plans.CumWalk]] cumulative-count walk on
   * the calibration cell table (partition-parallel for wide-range
   * nonconformity scores) and the coverage a broadcast threshold
   * filter — corpus rows never enter a window. Rank arithmetic ⌈(n+1)(1−α)⌉ is one
   * IEEE double expression, bit-identical across engines (both
   * evaluate the same product before ceil). An EMPTY calibration set
   * still yields the one documented row: `n_cal = 0`, rank from the
   * same formula, NULL threshold/coverage.
   */
  def conformal(cal: DataFrame, test: DataFrame, scoreCol: String,
                alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val head = conformalHead(cal, scoreCol, alpha)
    val t = conformalCells(test, scoreCol)
    val nTest = t.agg(coalesce(sum(col("__c")), lit(0L)).as("n_test"))
    val hits = t.crossJoin(broadcast(head))
      .where(col("__s") <= col("threshold")) // NULL threshold drops all
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__hits"))
    head.crossJoin(broadcast(nTest)).crossJoin(broadcast(hits))
      .select(col("n_cal"), col("rank"), col("threshold"), col("n_test"),
        when(col("threshold").isNull || col("n_test") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("__hits").cast("double") /
            col("n_test").cast("double"), 6)).as("coverage"))
  }

  private def conformalCells(df: DataFrame, scoreCol: String): DataFrame = df
    .where(col(scoreCol).isNotNull)
    .groupBy(round(col(scoreCol).cast("double"), 6).as("__s"))
    .agg(count(lit(1)).as("__c"))

  /** [[conformal]]'s calibration half: ONE row `(n_cal, rank,
    * threshold)` — the finite-sample order statistic walked on the
    * 6-dp calibration cell table. Built from an aggregate (not a group
    * over the cell table) so an EMPTY calibration set still produces
    * the documented head row. */
  private[operators] def conformalHead(cal: DataFrame, scoreCol: String,
                                       alpha: Double): DataFrame = {
    val c = conformalCells(cal, scoreCol)
    // cumulative calibration count via CumWalk — the order statistic
    // stays partition-parallel for wide-range nonconformity scores;
    // n_cal aggregates the WALKED frame (materialized cells), not the
    // raw cells, so the corpus reduce beneath them runs exactly once
    val walked = graft.plans.CumWalk.walk(c, "__s", asc = true,
      Seq(graft.plans.CumWalk.CumSum("__c", "__cum")))
    val nCal = walked.agg(coalesce(sum(col("__c")), lit(0L)).as("n_cal"))
    val ranked = walked
      .crossJoin(broadcast(nCal))
      .withColumn("__rank",
        ceil((col("n_cal").cast("double") + lit(1.0)) *
          lit(1.0 - alpha)).cast("long"))
    val thr = ranked
      .where(col("__cum") >= col("__rank"))
      .agg(min(col("__s")).as("__thr"))
    nCal
      .withColumn("__rank",
        ceil((col("n_cal").cast("double") + lit(1.0)) *
          lit(1.0 - alpha)).cast("long"))
      .crossJoin(broadcast(thr))
      .select(col("n_cal"), col("__rank").as("rank"),
        when(col("__rank") > col("n_cal"), lit(null).cast("double"))
          .otherwise(col("__thr")).as("threshold"))
  }

  /**
   * Streaming split-conformal monitor — [[conformal]]'s stream-static
   * twin (cross-checked in StreamingConformalCrossCheckSpec): the
   * calibration threshold is computed ONCE from the static calibration
   * set (the same cell walk as the batch head, collected — one bounded
   * row, the psiStream static-reference pattern), and the TEST side is
   * the stream: a single running aggregate of (count, hits-under-
   * threshold), published with the batch row's exact shape and
   * rounding. State is one aggregation row — run the sink in Complete
   * (or Update) mode; the row after the final micro-batch is
   * digit-identical to [[conformal]] on the same data. Works on a
   * batch `test` frame too (the same plan folds to one row), which is
   * what the oracle gate runs.
   */
  def conformalStream(cal: DataFrame, testStream: DataFrame,
                      scoreCol: String, alpha: Double = 0.1): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0,1), got $alpha")
    val h = conformalHead(cal, scoreCol, alpha).head()
    val nCal = h.getLong(0)
    val rank = h.getLong(1)
    val thrCol =
      if (h.isNullAt(2)) lit(null).cast("double") else lit(h.getDouble(2))
    testStream
      .where(col(scoreCol).isNotNull)
      .select(round(col(scoreCol).cast("double"), 6).as("__s"))
      .agg(count(lit(1)).as("__n"),
        count(when(col("__s") <= thrCol, lit(1))).as("__hits"))
      .select(lit(nCal).as("n_cal"), lit(rank).as("rank"),
        thrCol.as("threshold"), col("__n").as("n_test"),
        when(thrCol.isNull || col("__n") === 0, lit(null).cast("double"))
          .otherwise(round(col("__hits").cast("double") /
            col("__n").cast("double"), 6)).as("coverage"))
  }

  /**
   * Brier score with the Murphy (1973) decomposition over the same
   * fixed-width bins as [[calibrationBins]]: one row
   * `(n, brier, reliability, resolution, uncertainty)` where
   * `brier = mean((s−y)²)` exactly, `reliability = Σ n_k(s̄_k−ȳ_k)²/N`
   * (calibration error — lower is better), `resolution =
   * Σ n_k(ȳ_k−ȳ)²/N` (how much the bins separate outcomes — higher is
   * better), and `uncertainty = ȳ(1−ȳ)`. The textbook identity
   * `brier = reliability − resolution + uncertainty` holds up to the
   * within-bin score variance (binned REL/RES are the standard
   * estimates); `brier` itself is computed unbinned and exact.
   *
   * Scale shape: ONE corpus pass to ≤nBins cells (map-side combine);
   * every mean/term then computes on the cell table. Determinism:
   * scores clamp+round to 6 dp, squared terms round to 9 dp and sum as
   * DECIMAL, bin means round to 9 dp, published values to 6 dp.
   */
  def brierDecomposition(df: DataFrame, scoreCol: String, labelCol: String,
                         nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    def d(c: Column) = c.cast("double")
    val s = least(greatest(round(col(scoreCol).cast("double"), 6),
      lit(0.0)), lit(1.0))
    val dec = "decimal(28,9)"
    val cells = df
      .select(s.as("__s"), col(labelCol).cast("boolean").as("__b"))
      .filter(col("__s").isNotNull && col("__b").isNotNull)
      .select(col("__s"),
        when(col("__b"), lit(1.0)).otherwise(lit(0.0)).as("__y"),
        least(floor(col("__s") * nBins), lit(nBins - 1L)).cast("int")
          .as("bin"))
      .groupBy("bin").agg(
        count(lit(1)).as("__n"),
        sum(col("__s").cast(dec)).as("__ss"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(round((col("__s") - col("__y")) * (col("__s") - col("__y")), 9)
          .cast(dec)).as("__sq"))
    val totals = cells.agg(sum("__n").as("n"),
      sum(col("__sq")).as("__sqt"), sum(col("__sy")).as("__syt"))
    val withTot = cells.crossJoin(broadcast(totals))
    val sbar = round(d(col("__ss")) / d(col("__n")), 9)
    val ybar = round(d(col("__sy")) / d(col("__n")), 9)
    val yAll = round(d(col("__syt")) / d(col("n")), 9)
    withTot
      .select(col("n"), col("__sqt"), yAll.as("__yb"),
        round(d(col("__n")) * round((sbar - ybar) * (sbar - ybar), 9), 9)
          .cast(dec).as("__rel"),
        round(d(col("__n")) * round((ybar - yAll) * (ybar - yAll), 9), 9)
          .cast(dec).as("__res"))
      .groupBy(col("n"), col("__sqt"), col("__yb")) // constants: 1 group
      .agg(sum(col("__rel")).as("__rels"), sum(col("__res")).as("__ress"))
      .select(col("n"),
        round(d(col("__sqt")) / d(col("n")), 6).as("brier"),
        round(d(col("__rels")) / d(col("n")), 6).as("reliability"),
        round(d(col("__ress")) / d(col("n")), 6).as("resolution"),
        round(col("__yb") * (lit(1.0) - col("__yb")), 6).as("uncertainty"))
  }

  /**
   * Per-class classification report — the audit of a quality/toxicity
   * classifier against gold labels before its verdicts filter a corpus:
   * one row per label in gold ∪ predicted,
   * `(label, support, tp, fp, fn, precision, recall, f1)`. Precision is
   * NULL when the class is never predicted, recall NULL when it never
   * occurs in gold, F1 NULL when either is (division by an absent
   * denominator is undefined, not zero — masking it as 0 hides the
   * difference between "never fires" and "always wrong").
   *
   * Scale shape: the corpus reduces to |labels|² confusion cells in ONE
   * map-side-combined aggregate; tp/fp/fn derive from two |labels|-row
   * re-aggregations of that cell table. Exact integer counts; the three
   * ratios are single divisions rounded to 6 dp.
   */
  def classificationReport(df: DataFrame, goldCol: String,
                           predCol: String): DataFrame = {
    val cells = df.groupBy(col(goldCol).as("__g"), col(predCol).as("__p"))
      .agg(count(lit(1)).as("__c"))
    val byGold = cells.groupBy(col("__g").as("label"))
      .agg(sum("__c").as("support"),
        coalesce(sum(when(col("__p") === col("__g"), col("__c"))), lit(0L))
          .as("tp_g"))
    val byPred = cells.groupBy(col("__p").as("label"))
      .agg(sum("__c").as("predicted"),
        coalesce(sum(when(col("__p") === col("__g"), col("__c"))), lit(0L))
          .as("tp_p"))
    byGold.join(byPred, Seq("label"), "full_outer")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp_g"), col("tp_p"), lit(0L)).as("tp"),
        (coalesce(col("predicted"), lit(0L)) -
          coalesce(col("tp_p"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) -
          coalesce(col("tp_g"), lit(0L))).as("fn"))
      .withColumn("precision", when(col("tp") + col("fp") > 0,
        round(col("tp").cast("double") / (col("tp") + col("fp")), 6)))
      .withColumn("recall", when(col("support") > 0,
        round(col("tp").cast("double") / col("support"), 6)))
      .withColumn("f1", when(
        col("precision").isNotNull && col("recall").isNotNull &&
          col("precision") + col("recall") > 0,
        round(lit(2.0) * col("precision") * col("recall") /
          (col("precision") + col("recall")), 6)))
  }

  /**
   * k-NN label-noise audit (the neighborhood-consistency heart of
   * confident-learning / cleanlab-style label-error detection): for
   * each labeled point, the majority label among its nearest neighbors
   * — a point whose neighborhood votes differently is a mislabeling
   * suspect, reviewed before the label trains or filters anything.
   *
   * Takes ANY neighbor table (`topk`: one row per (query, neighbor)) —
   * [[Ann.bruteForceTopK]] for exact audits, [[Ann.lshTopK]] /
   * [[Ann.ivfTopK]] as the corpus-scale path — so the quadratic part
   * stays in the ANN tier where it's already bounded. Majority ties
   * break to the smallest label (the repo's vote convention); points
   * absent from the top-k table produce no row.
   *
   * Output: `(id, label, knn_label, n_votes, n_majority, agreement,
   * suspect)` — agreement = n_majority/n_votes at 6 dp, suspect =
   * (knn_label != label). Scale shape: one (query, label) count over
   * the k·|queries|-row top-k table, a per-query window over ≤|labels|
   * candidate rows, and two id-keyed joins against the label table.
   */
  def knnLabelNoise(topk: DataFrame, queryIdCol: String,
                    neighborIdCol: String,
                    labels: DataFrame, idCol: String,
                    labelCol: String): DataFrame = {
    val nbrLabels = labels.select(col(idCol).as("__nid"),
      col(labelCol).as("__nlabel"))
    val votes = topk
      .select(col(queryIdCol).as("id"), col(neighborIdCol).as("__nid"))
      .join(nbrLabels, "__nid")
      .groupBy(col("id"), col("__nlabel"))
      .agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("__n").desc, col("__nlabel").asc)
    val perQuery = votes
      .withColumn("__rn", row_number().over(w))
      .withColumn("__tot", sum(col("__n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")))
      .filter(col("__rn") === 1)
      .select(col("id"), col("__nlabel").as("knn_label"),
        col("__tot").as("n_votes"), col("__n").as("n_majority"))
    perQuery
      .join(labels.select(col(idCol).as("id"), col(labelCol).as("label")),
        "id")
      .select(col("id"), col("label"), col("knn_label"), col("n_votes"),
        col("n_majority"),
        round(col("n_majority").cast("double") / col("n_votes"), 6)
          .as("agreement"),
        (col("knn_label") =!= col("label")).as("suspect"))
  }

  /**
   * Rank-biased overlap (Webber et al. 2010) between the top-`k`
   * rankings two scorers induce over the same item set — the
   * top-weighted "do these rankers agree where it matters" number that
   * plain set-overlap@k and rank correlation both miss (RBO discounts
   * depth geometrically, so swapping ranks 1↔2 costs far more than
   * 29↔30). Truncated form: `RBO@k = (1−p) Σ_{d=1..k} p^{d−1}·|A_d ∩
   * B_d|/d` where `A_d`/`B_d` are the top-d prefixes. One row:
   * `(k, p, rbo)`.
   *
   * Each side ranks by its score DESC with the item id as the
   * deterministic tie-break. `p` must be a negative power of two
   * (default 0.5): the depth weights `p^{d−1}` are then exactly
   * representable and both engines compute every term bit-identically
   * (an arbitrary `p` would hang cross-engine equality on libm `pow`).
   *
   * Scale shape: each side reduces to its top-k via orderBy+limit —
   * TakeOrderedAndProject, a per-partition heap then a k-row driver
   * merge, the same shape as `Sample.topK`; everything after (rank
   * windows, the full-outer item join, the k-depth expansion) runs on
   * ≤ 2k rows. The corpus is scanned once per side and never shuffles.
   *
   * Determinism: ranks and overlap counts are exact integers;
   * `ov/d` is one exact int/int double division, the term rounds to
   * 9 dp and sums as DECIMAL; the published `rbo` rounds to 6 dp.
   */
  def rbo(a: DataFrame, b: DataFrame, itemCol: String, scoreCol: String,
          k: Int = 30, p: Double = 0.5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(p > 0 && p < 1 &&
      (java.lang.Double.doubleToLongBits(p) & 0x000FFFFFFFFFFFFFL) == 0L,
      s"p must be a negative power of two for cross-engine exactness, got $p")
    val w = org.apache.spark.sql.expressions.Window
    def topRanked(df: DataFrame, out: String) = df
      .select(col(itemCol).as("__item"), col(scoreCol).as("__s"))
      .orderBy(col("__s").desc, col("__item"))
      .limit(k)
      .withColumn(out, row_number().over(
        w.partitionBy(lit(1)).orderBy(col("__s").desc, col("__item"))))
      .select(col("__item").as(s"__i$out"), col(out))
    val ra = topRanked(a, "__ra")
    val rb = topRanked(b, "__rb")
    val pairs = ra.join(rb, col("__i__ra") === col("__i__rb"), "full_outer")
      .select(col("__ra"), col("__rb"))
    // literal depth spine with exact p^{d-1} weights — k rows, built
    // driver-side (k is a parameter, not data)
    val spark = a.sparkSession
    import spark.implicits._
    val depths = (1 to k).map(d => (d, math.pow(p, d - 1))).toDF("d", "__w")
    depths.join(pairs,
        coalesce(col("__ra"), lit(Int.MaxValue)) <= col("d") &&
        coalesce(col("__rb"), lit(Int.MaxValue)) <= col("d"), "left")
      .groupBy("d", "__w")
      .agg(count(col("__ra")).as("__ov"))
      .withColumn("__term",
        round(col("__w") * (col("__ov").cast("double") / col("d").cast("double")), 9))
      .agg(max(col("d")).as("k"), lit(p).as("p"),
        round(lit(1.0 - p) *
          sum(col("__term").cast("decimal(20,9)")).cast("double"), 6)
          .as("rbo"))
  }
}
