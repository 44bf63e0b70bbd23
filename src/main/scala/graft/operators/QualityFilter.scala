package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document quality filtering for training-data curation — the
 * Gopher-rule / C4-style heuristic battery (Rae et al. 2021 §A1.1,
 * Raffel et al. 2020 §2.2), an extension beyond the reference's surface
 * (SURVEY §2.4: the app layer implements no text functions).
 *
 * Every metric is built from codegen'd Spark built-ins over one pass of
 * the text column — no UDFs, no shuffle: the whole battery is a single
 * projection, so at 100 TB it runs at scan speed and the subsequent
 * `keep` filter pushes into the same stage. All fractional metrics are
 * exact-integer counts divided in fixed expression shapes and rounded to
 * 6 decimals, which makes them engine-portable (the DuckDB oracle
 * reproduces them bit-for-bit).
 */
object QualityFilter {

  /** The Gopher stopword probe list (Rae et al. 2021, §A1.1). */
  val gopherStopwords: Seq[String] = graft.functions.NativeQuality.gopherStopwords

  /** Non-empty whitespace tokens. */
  private def words(text: Column): Column =
    filter(TextFunctions.tokens(text), w => length(w) > 0)

  /** Non-blank lines (newline-split, blank lines dropped). */
  private def lines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  private def frac(num: Column, den: Column): Column =
    round(when(den > 0, num.cast("double") / den.cast("double"))
      .otherwise(lit(0.0)), 6)

  /**
   * Per-document quality metrics, one codegen'd projection:
   *
   *  - `n_words`        non-empty whitespace tokens
   *  - `mean_word_len`  mean token length (0.0 for empty docs)
   *  - `symbol_ratio`   (`#` + `...` occurrences) / words — Gopher's
   *                     symbol-to-word rule
   *  - `bullet_frac`    fraction of lines starting with `-`/`*`/`•`
   *  - `ellipsis_frac`  fraction of lines ending with `...`
   *  - `alpha_frac`     fraction of words containing a letter
   *  - `n_stopwords`    hits on the 8-word Gopher probe list
   *  - `dup_line_frac`  repeated-line fraction (1 − distinct/total)
   */
  def metrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.graftshim.CatalystBridge
    val q = CatalystBridge.column(
      graft.functions.QualityMetrics(CatalystBridge.expression(col(textCol))))
    // one native evaluation; field extraction is subexpression-eliminated
    // inside whole-stage codegen, so the battery costs ONE pass per row
    df.select(col(idCol), q.as("__q"))
      .select(col(idCol),
        col("__q.n_words").as("n_words"),
        col("__q.mean_word_len").as("mean_word_len"),
        col("__q.symbol_ratio").as("symbol_ratio"),
        col("__q.bullet_frac").as("bullet_frac"),
        col("__q.ellipsis_frac").as("ellipsis_frac"),
        col("__q.alpha_frac").as("alpha_frac"),
        col("__q.n_stopwords").as("n_stopwords"),
        col("__q.dup_line_frac").as("dup_line_frac"))
  }

  /**
   * Gopher repetition rules: per-doc most-frequent-n-gram character
   * coverage (`top_ngram`, `top_count`, `top_frac`) and duplicated-n-gram
   * character coverage (`dup_frac`) — one native hash-map pass per row
   * (see [[graft.functions.NativeQuality.repetition]]), no shuffle.
   */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftshim.CatalystBridge
    val r = CatalystBridge.column(
      graft.functions.RepetitionMetrics(CatalystBridge.expression(col(textCol)), n))
    df.select(col(idCol), r.as("__r"))
      .select(col(idCol),
        col("__r.top_ngram").as("top_ngram"),
        col("__r.top_count").as("top_count"),
        col("__r.top_frac").as("top_frac"),
        col("__r.dup_frac").as("dup_frac"))
  }

  /** The composable Column formulation of [[metrics]] — the executable
    * spec the native expression is pinned against (CurationSpec); each
    * metric re-derives its inputs as interpreted HOF trees, so use
    * [[metrics]] on the hot path. */
  private[graft] def metricsHof(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val ws = words(t)
    val ls = lines(t)
    val nWords = size(ws)
    val nLines = size(ls)
    // '#' occurrences via translate; '...' via replace-length delta / 3.
    // Both engines' replace() scans left-to-right non-overlapping, so the
    // counts agree on runs of dots.
    val nHash = length(t) - length(translate(t, "#", ""))
    val nEllipsis = (length(t) - length(replace(t, lit("..."), lit("")))) / 3
    val lowered = transform(ws, w => lower(w))
    df.select(
      col(idCol),
      nWords.as("n_words"),
      round(when(nWords > 0,
        aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          nWords.cast("double")).otherwise(lit(0.0)), 6).as("mean_word_len"),
      frac(nHash + nEllipsis, nWords).as("symbol_ratio"),
      frac(size(filter(ls, l => regexp_like(ltrim(l), lit("^[-*•]")))), nLines)
        .as("bullet_frac"),
      frac(size(filter(ls, l => rtrim(l).endsWith("..."))), nLines)
        .as("ellipsis_frac"),
      frac(size(filter(ws, w => regexp_like(w, lit("[A-Za-z]")))), nWords)
        .as("alpha_frac"),
      size(filter(lowered, w => w.isInCollection(gopherStopwords)))
        .as("n_stopwords"),
      TextFunctions.repeatedSegmentFraction(t, "\n").as("dup_line_frac"))
  }

  /** The keep-decision over metric fields, shared between the auditable
    * flag column and the pure-filter survivor path. */
  private def keepOf(f: String => Column, minWords: Int, maxWords: Int): Column = {
    import graft.functions.{NativeQuality => NQ}
    f("n_words") >= minWords && f("n_words") <= maxWords &&
      f("mean_word_len") >= NQ.MeanWordLenMin && f("mean_word_len") <= NQ.MeanWordLenMax &&
      f("symbol_ratio") < NQ.SymbolRatioMax &&
      f("bullet_frac") < NQ.BulletFracMax && f("ellipsis_frac") < NQ.EllipsisFracMax &&
      f("alpha_frac") >= NQ.AlphaFracMin && f("n_stopwords") >= NQ.StopwordsMin &&
      f("dup_line_frac") < NQ.DupLineFracMax
  }

  /**
   * Gopher keep/drop decision. Thresholds are the published defaults
   * (word-count window relaxed via `minWords` for short-document corpora);
   * `keep` is emitted as a column so the decision is auditable.
   */
  def gopherFlags(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame =
    metrics(df, idCol, textCol)
      .withColumn("keep", keepOf(col, minWords, maxWords))

  /**
   * Survivors of the Gopher battery (original columns preserved) — a
   * PURE per-row filter over the native metric struct: one scan, zero
   * shuffle, no self-join (plan-asserted). At 100 TB this is the
   * difference between a filter at scan speed and re-shuffling the
   * corpus through a semi-join.
   */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    import org.apache.spark.sql.graftshim.CatalystBridge
    df.filter(CatalystBridge.column(graft.functions.GopherKeep(
      CatalystBridge.expression(col(textCol)), minWords, maxWords)))
  }

  /**
   * Sequential curation funnel audit: apply keep-rules IN ORDER and
   * report, per rule, how many documents reach it and how many it
   * removes (a document is charged to the FIRST rule it fails — the
   * attribution a pipeline owner needs to see which rule is doing the
   * cutting, which C4/Gopher/RefinedWeb papers all report). One row per
   * rule: `(rule_order, rule, n_in, n_removed, n_out, removal_rate)`;
   * `n_out` of the last rule is the corpus that survives the funnel.
   * A NULL rule verdict counts as a failure (a rule that cannot evaluate
   * a document should not silently pass it).
   *
   * Scale shape: ONE corpus scan computes each row's first-failing-rule
   * index (a nested conditional projection — no joins, no per-rule
   * passes), reduced map-side to ≤|rules|+1 counts; the cumulative
   * window runs on that |rules|-row table only (size-bounded, same
   * justification as Mix's stats window).
   */
  def funnelReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "rules must be non-empty")
    val firstFail = rules.zipWithIndex.foldRight(lit(null).cast("int")) {
      case (((_, cond), i), acc) =>
        when(!coalesce(cond, lit(false)), lit(i)).otherwise(acc)
    }
    val counts = df.select(firstFail.as("__ff"))
      .groupBy("__ff").agg(count(lit(1)).as("__c"))
    val spark = df.sparkSession
    import spark.implicits._
    val meta = rules.zipWithIndex
      .map { case ((name, _), i) => (i, name) }.toDF("rule_order", "rule")
    val removed = meta
      .join(counts.withColumnRenamed("__ff", "rule_order"),
        Seq("rule_order"), "left")
      .select(col("rule_order"), col("rule"),
        coalesce(col("__c"), lit(0L)).as("n_removed"))
    val total = counts.agg(coalesce(sum("__c"), lit(0L)).as("__total"))
    // bounded-window: rules — |rules|-row funnel walk
    val w = org.apache.spark.sql.expressions.Window.orderBy("rule_order")
      .rowsBetween(Long.MinValue, -1)
    removed.crossJoin(total)
      .withColumn("n_in",
        col("__total") - coalesce(sum("n_removed").over(w), lit(0L)))
      .select(col("rule_order"), col("rule"), col("n_in"), col("n_removed"),
        (col("n_in") - col("n_removed")).as("n_out"),
        when(col("n_in") > 0,
          round(col("n_removed").cast("double") / col("n_in"), 6))
          .as("removal_rate"))
  }

  /** Count of listed words in the document, whole-token matches on the
    * lowercased whitespace tokenization ("class" never hits a list entry
    * "ass" — the C4 badword pass is word-boundary, not substring). */
  def listedWordHits(text: Column, listed: Seq[String]): Column = {
    val set = listed.map(_.toLowerCase)
    size(filter(split(trim(lower(coalesce(text, lit("")))), "\\s+"),
      t => t.isInCollection(set)))
  }

  /**
   * C4-style content filter: drop documents containing ANY listed word
   * (word-boundary match). A pure per-row filter — the list ships as a
   * literal, so it runs at scan speed, pushes into the parquet scan, and
   * applies UNCHANGED to a stream. NULL text carries no listed word and
   * is kept (it is a length/quality concern, not a content one).
   */
  def dropListedWords(df: DataFrame, textCol: String,
                      listed: Seq[String]): DataFrame =
    if (listed.isEmpty) df
    else df.filter(listedWordHits(col(textCol), listed) === 0)

  /**
   * Domain-level quality propagation — the Common-Crawl-style pass where
   * a source/domain's AGGREGATE quality decides its documents' fate
   * (junk farms get filtered wholesale even when individual pages sneak
   * past per-doc thresholds): per-domain mean score joined back,
   * `keep = domain_mean >= minMean`.
   *
   * The mean is the repo's exact-decimal sum (9 dp pre-round) divided
   * once as DOUBLE — partitioning-independent, so the keep decision is
   * too. Output `domain_mean` rounds to 6 dp for the float policy; the
   * keep comparison uses the UNROUNDED mean (same expression both
   * engines, so the boundary case agrees).
   *
   * Scale shape: the stats aggregate map-side-combines to |domains|
   * partials; the join-back is stats-side small (AQE broadcasts it), so
   * a skewed giant domain costs only its own scan — no per-doc state.
   */
  def domainQuality(df: DataFrame, idCol: String, domainCol: String,
                    scoreCol: String, minMean: Double): DataFrame = {
    val stats = df.groupBy(col(domainCol))
      .agg((sum(round(col(scoreCol), 9).cast("decimal(27,9)")).cast("double") /
        count(lit(1))).as("__mean"), count(lit(1)).as("n_docs"))
    df.select(col(idCol), col(domainCol), col(scoreCol))
      .join(stats, domainCol)
      .select(col(idCol), col(domainCol), col("n_docs"),
        round(col("__mean"), 6).as("domain_mean"),
        (col("__mean") >= minMean).as("keep"))
  }

  /**
   * Flesch readability per document — reading ease and the
   * Flesch–Kincaid grade level, the classic curation signal for
   * audience/complexity bucketing (too-simple boilerplate and
   * unreadable symbol soup both score at the extremes):
   *
   *  - `n_words`      non-empty whitespace tokens
   *  - `n_sentences`  `[.!?]+` terminator runs, floored at 1 (a
   *                   fragment is one sentence, not zero)
   *  - `n_syllables`  per word, `[aeiouy]+` vowel-group runs of the
   *                   lowercased token floored at 1 — the standard
   *                   dictionary-free approximation
   *  - `flesch`       206.835 − 1.015·(words/sentences) −
   *                   84.6·(syllables/words)
   *  - `fk_grade`     0.39·(words/sentences) + 11.8·(syllables/words)
   *                   − 15.59
   *
   * Both scores are NULL for word-less documents. Like the rest of the
   * battery this is ONE codegen'd projection of built-ins (split /
   * regexp_extract_all / aggregate) — no UDF, no shuffle, stream-legal,
   * scan-speed at 100 TB. Determinism: all three counts are exact
   * integers; words/sentences and syllables/words are single exact
   * int/int double divisions and the two linear forms are fixed-shape
   * double arithmetic, rounded to 6 dp — the DuckDB oracle mirrors the
   * formulas token for token.
   */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // NULL text reads as empty (0 words → NULL scores), not a NULL array
    val ws = words(coalesce(col(textCol), lit("")))
    val nw = size(ws).cast("long")
    val ns = greatest(lit(1L),
      size(regexp_extract_all(coalesce(col(textCol), lit("")),
        lit("[.!?]+"), lit(0))).cast("long"))
    val ny = aggregate(ws, lit(0L), (acc, w) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(lower(w), lit("[aeiouy]+"), lit(0)))
          .cast("long")))
    df.select(col(idCol), nw.as("n_words"), ns.as("n_sentences"),
        ny.as("n_syllables"))
      // guards INSIDE the ratio columns: ANSI mode faults a 0-divisor
      // double division even when a later CASE would discard it
      .withColumn("__wps", when(col("n_words") === 0, lit(null).cast("double"))
        .otherwise(
          col("n_words").cast("double") / col("n_sentences").cast("double")))
      .withColumn("__ypw", when(col("n_words") === 0, lit(null).cast("double"))
        .otherwise(
          col("n_syllables").cast("double") / col("n_words").cast("double")))
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(round(
            lit(206.835) - lit(1.015) * col("__wps") -
              lit(84.6) * col("__ypw"), 6)).as("flesch"),
        when(col("n_words") === 0, lit(null).cast("double"))
          .otherwise(round(
            lit(0.39) * col("__wps") + lit(11.8) * col("__ypw") -
              lit(15.59), 6)).as("fk_grade"))
  }
}
