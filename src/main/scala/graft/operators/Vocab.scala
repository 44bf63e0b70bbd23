package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus vocabulary extraction and out-of-vocabulary (OOV) scoring — the
 * vocabulary-coverage quality signal of training-data pipelines (docs
 * with high OOV rates against a reference vocabulary are noise, code, or
 * the wrong language).
 *
 * Scale shape mirrors [[Decontaminate]]: the vocabulary is the SMALL side
 * (top-k terms), so scoring is explode → broadcast join → re-aggregate by
 * doc id; partial aggregation collapses each partition's token counts
 * before the single shuffle, which carries (doc_id, counts) pairs only.
 */
object Vocab {

  /** Deterministic top-k corpus vocabulary by (count DESC, term ASC),
    * lowercased whitespace tokens. */
  def topVocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("term").asc)
      .limit(k)

  /**
   * BPE merge-candidate induction, step zero of tokenizer training: the
   * top-k most frequent ADJACENT CHARACTER PAIRS across all whitespace
   * tokens (non-distinct — a word occurring twice contributes its pairs
   * twice, as BPE counts corpus frequency, not type frequency).
   * `(rank, pair, cnt)`, rank by (count DESC, pair ASC) so ties are
   * deterministic.
   *
   * Scale shape: tokens explode to pairs via a codegen'd
   * `transform(sequence)` projection (no UDF), partial aggregation
   * collapses each partition's pair counts before the one shuffle
   * (pair-space is bounded by charset², so partials are tiny), and the
   * top-k is a single-partition sort of that bounded aggregate — the
   * same shape full BPE training iterates.
   */
  def bpeMergeCandidates(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
      .withColumn("rank",
        // bounded-window: topk — re-ranks the limit(k) result
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair").asc)).cast("long"))
      .select("rank", "pair", "cnt")

  /**
   * Per-document OOV rate against `vocab` (a one-column `term` relation):
   * fraction of the doc's (lowercased) tokens not present in the
   * vocabulary, rounded to 6 decimals.
   */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
    toks.join(broadcast(vocab.select(col("term"), lit(1).as("__in"))),
        Seq("term"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6))
  }

  /**
   * Tokenizer fertility by group (typically language): BPE-ish tokens
   * per whitespace word, and characters per token — the multilingual
   * tokenizer-equity report. A tokenizer trained mostly on English
   * "explodes" other scripts into many more tokens per word, which
   * silently taxes those languages' effective context window and
   * training budget; this is the table that makes the tax visible.
   *
   * Scale shape: one codegen'd projection (regex token count, token
   * filter, length) then a map-side-combined sum per group — group
   * cardinality is #languages, so the shuffle is trivially small.
   * Integer sums, exactly two final divisions rounded to 6 dp.
   */
  def tokenizerFertility(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        TextFunctions.bpeTokenCount(col(textCol)).cast("long").as("b"),
        size(filter(TextFunctions.tokens(col(textCol)),
          t => length(t) > 0)).cast("long").as("w"),
        length(col(textCol)).cast("long").as("c"))
      .groupBy("grp").agg(
        sum("b").as("n_bpe"), sum("w").as("n_words"),
        sum("c").as("n_chars"))
      .select(col("grp").as(groupCol), col("n_bpe"), col("n_words"),
        col("n_chars"),
        round(col("n_bpe").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_bpe").cast("double"), 6)
          .as("chars_per_token"))

  /**
   * BPE ENCODING with a learned merge list — the other half of
   * [[bpeMergeCandidates]]: per-document token count after applying
   * `merges` (ordered by rank) to every lowercased whitespace word. The
   * real token-budget signal: [[TextFunctions]]' regex count
   * approximates a tokenizer; this IS one, for the given merge table.
   *
   * Encoding is per-word symbol rewriting: the word becomes a
   * space-separated symbol string ("t h e"), and each merge (a,b), in
   * rank order, rewrites every non-overlapping "a b" to "ab" — a chain
   * of literal `replace` calls, one per merge. For a WELL-FORMED merge
   * list (each merge's two symbols are single characters or outputs of
   * EARLIER merges — true of any list actually learned by BPE training,
   * which can only pair symbols that already exist) this single
   * rank-ordered pass is exactly the iterated highest-priority-first
   * encoding loop: a merge can never create an adjacency for an
   * earlier-ranked merge, because that earlier merge's constituents
   * were all formed before it.
   *
   * Scale shape: pure codegen'd string expressions (explode + replace
   * chain + split/size), one map-side-combined sum shuffle on doc id —
   * the merge table is compiled INTO the plan, not joined. Merge lists
   * are bounded (50k for GPT-2); each merge is one literal replace, and
   * for very long lists the chain should be built in rank order exactly
   * as here, just from a collected merge table.
   */
  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !(a + b).contains(' ') },
      "merge symbols must be non-empty and space-free")
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
    val spaced = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val merged = merges.foldLeft(spaced) { case (c, (a, b)) =>
      replace(c, lit(s"$a $b"), lit(a + b))
    }
    val counts = toks
      .select(col("id"), size(split(merged, " ")).cast("long").as("wt"))
      .groupBy("id").agg(sum("wt").as("n_tokens"))
    // empty/whitespace-only docs still get a row (0 tokens)
    df.select(col(idCol).as("id")).join(counts, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).cast("long").as("n_tokens"))
  }

  /**
   * Vocabulary coverage curve — how much of the corpus token mass the
   * top-k vocabulary captures, for each requested k: the sizing curve
   * behind "how big does my tokenizer's word list need to be". One row
   * per k: `(k, vocab_terms, covered_occurrences, coverage)` with
   * `vocab_terms = min(k, |vocab|)`, rank by (count DESC, term ASC).
   *
   * Scale shape: the corpus collapses to the term-count table in one
   * map-side-combined aggregate, and the cumulative walk then runs on
   * COUNT-VALUE CELLS, not terms: all terms sharing an occurrence
   * count contribute interchangeable mass, so the mass covered through
   * rank r is (full higher-count cells) + (r − terms before the cell)
   * × the cell's count — exact integer arithmetic, identical to
   * ranking the raw vocabulary (the per-term tie-break only ordered
   * equal-mass terms). Distinct counts are HARD-bounded by √(2N)
   * (counts are positive integers summing to N — all-distinct forces
   * 1+2+…+V ≤ N), so a 10⁸-term vocabulary walks a ≤√(2N)-row frame
   * instead of 10⁸ rows. Each k picks ONE cell, so the curve costs one
   * broadcast-join regardless of |ks|.
   */
  def coverageCurve(df: DataFrame, textCol: String, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks.distinct == ks,
      "ks must be distinct positive ranks")
    val counts = df
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("__n"))
    val cells = counts.groupBy(col("__n")).agg(count(lit(1)).as("__m"))
    // bounded-window: integer-cells — distinct occurrence counts, ≤ √(2N) by the partition bound (scaladoc above)
    val wC = org.apache.spark.sql.expressions.Window
      .orderBy(col("__n").desc)
    val walk = cells
      .withColumn("__cumT", sum(col("__m")).over(wC))
      .withColumn("__cumM", sum(col("__m") * col("__n")).over(wC))
    val totals = walk.agg(
      coalesce(sum(col("__m") * col("__n")), lit(0L)).as("__total"),
      coalesce(sum(col("__m")), lit(0L)).as("__v"))
    val spark = df.sparkSession
    import spark.implicits._
    val r = least(col("k").cast("long"), col("__v"))
    val covered = col("__cumM") - (col("__cumT") - r) * col("__n")
    walk.crossJoin(broadcast(totals))
      .join(broadcast(ks.toDF("k")),
        col("__cumT") - col("__m") < r && r <= col("__cumT"))
      .select(col("k"), r.as("vocab_terms"),
        covered.as("covered_occurrences"),
        round(covered.cast("double") / col("__total"), 6).as("coverage"))
  }
}
