package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CatalystBridge

/**
 * Text-analysis primitives for large-scale training-data pipelines, built
 * entirely from codegen'd Spark SQL built-ins (no UDFs) so they stay inside
 * whole-stage codegen and scale linearly with input size.
 *
 * These extend the reference's surface (it has no text functions — SURVEY
 * §2.4); they are the LLM-data-pipeline operators called for by
 * BASELINE.json's north star.
 */
object TextFunctions {

  /** Whitespace tokens of trimmed text. `''` yields `['']` — matching
    * DuckDB's `regexp_split_to_array` used by the test oracle. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * BPE-ish sub-word segmentation (GPT-2-style pre-tokenizer pattern,
   * restricted to RE2-compatible syntax so the DuckDB oracle matches):
   * contraction suffixes, space-prefixed letter/digit runs, punctuation
   * runs, whitespace runs.
   */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /**
   * Fraction of non-empty segments that are repeats of an earlier
   * segment (Gopher-style repetition quality rule, parameterized by the
   * split regex: `"\\s+"` = repeated words, `"\\n"` = repeated lines,
   * `"\\. "` = repeated sentences). 1 − distinct/total over exact
   * integer counts, so the double is engine-identical; rounded to 6
   * decimals like [[qualityScore]].
   */
  def repeatedSegmentFraction(text: Column, sepRegex: String = "\\s+"): Column = {
    val segs = filter(split(trim(text), sepRegex),
      s => length(trim(s)) > 0)
    round(when(size(segs) > 0,
      (size(segs) - size(array_distinct(segs))).cast("double") / size(segs))
      .otherwise(lit(0.0)), 6)
  }

  /**
   * Word n-gram shingles, space-joined: `["a b c", "b c d", ...]`.
   * Documents shorter than `n` tokens produce one whole-document shingle.
   */
  def wordShingles(toks: Column, n: Int): Column = {
    require(n >= 1)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column = {
    require(n >= 1)
    val t = trim(text)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n))))
      .otherwise(array(t))
  }

  /** xxhash64 of each distinct shingle — the compact set representation
    * used by MinHash/Jaccard (longs shuffle ~10x cheaper than strings).
    * Native one-pass expression (see NativeText); value-identical to
    * `array_distinct(transform(wordShingles(tokens(text), n), xxhash64))`
    * but ~1000x faster than that interpreted HOF tree. */
  def hashedShingleSet(text: Column, n: Int): Column =
    CatalystBridge.column(HashedShingles(CatalystBridge.expression(text), n))

  /** Word n-gram shingle strings (non-distinct, positional) — the native
    * one-pass variant of `wordShingles(tokens(text), n)` for corpus stats
    * where the gram text itself is the output (spec-pinned identical). */
  def stringShingles(text: Column, n: Int): Column =
    CatalystBridge.column(StringShingles(CatalystBridge.expression(text), n))

  /** xxhash64 of each whitespace token (non-distinct) — SimHash input. */
  def hashedTokens(text: Column): Column =
    CatalystBridge.column(HashedTokens(CatalystBridge.expression(text)))

  /** k MinHash permutation minima over a hashed shingle set. */
  def minhashSignature(hashes: Column, k: Int): Column =
    CatalystBridge.column(MinHashSig(CatalystBridge.expression(hashes), k))

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(1.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Small multilingual stopword lists for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "and", "to", "in", "is", "that", "it", "for", "on", "with", "as"),
    "es" -> Seq("el", "los", "las", "una", "uno", "y", "es", "en", "que", "por", "con", "para", "del"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit", "auf", "für"),
    "fr" -> Seq("le", "les", "une", "et", "est", "que", "pour", "dans", "qui", "pas", "sur", "avec"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他", "有", "这", "上"))

  /** Per-language stopword hit count over the token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  /**
   * N-gram-heuristic language ID: argmax of stopword hits, ties broken by
   * the fixed language order, zero hits → "und". Deterministic, so it can
   * be cross-checked against an equivalent SQL oracle.
   */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scores = langs.map(l => l -> stopwordHits(toks, l))
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), elseCol) =>
      when(maxScore > 0 && s === maxScore, lit(l)).otherwise(elseCol)
    }
  }

  /**
   * Heuristic quality score in [0,1]: length signal, lexical diversity,
   * stopword presence, and alphanumeric ratio, equally mirrorable in the
   * DuckDB oracle. All counts are exact integers; the only floating-point
   * ops are the final fixed-shape arithmetic, rounded to 6 decimals.
   */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nt = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    val stop = stopwordHits(toks, "en").cast("double")
    val nchars = length(text).cast("double")
    val alnum = length(regexp_replace(text, "[^a-zA-Z0-9]", "")).cast("double")
    val lenSignal = least(nt / lit(100.0), lit(1.0))
    val diversity = when(nt > 0, nd / nt).otherwise(lit(0.0))
    val stopSignal = when(nt > 0, least(stop * lit(5.0) / nt, lit(1.0))).otherwise(lit(0.0))
    val alnumRatio = when(nchars > 0, alnum / nchars).otherwise(lit(0.0))
    round(lenSignal * lit(0.25) + diversity * lit(0.25) +
      stopSignal * lit(0.25) + alnumRatio * lit(0.25), 6)
  }

  /** Unicode script ranges for [[scriptProfile]], in the `\x{…}` class
    * syntax Java regex and RE2 share (the DuckDB oracle states the same
    * classes). Deliberately the big contiguous blocks, not full Unicode
    * script properties — `\p{Script=…}` is NOT portable across engines. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "latin"    -> "A-Za-z",
    "digit"    -> "0-9",
    "space"    -> " \\t\\n\\r",
    "cjk"      -> "\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}",
    "cyrillic" -> "\\x{0400}-\\x{04ff}",
    "arabic"   -> "\\x{0600}-\\x{06ff}")

  /**
   * Per-document character-class fractions — struct of
   * `latin/digit/space/cjk/cyrillic/arabic/other`, each rounded to
   * 6 dp (empty or NULL text → all zero). The cheap "is this corpus
   * slice the language its metadata claims" screen: wrong-script text is
   * the loudest contamination signal and needs no model. Evaluates as
   * ONE native codepoint walk ([[NativeText.scriptCounts]]); the
   * seven-regex HOF formulation below is value-identical (spec-pinned)
   * and exists as the oracle-shaped reference.
   */
  def scriptProfile(text: Column): Column =
    CatalystBridge.column(ScriptProfile(
      CatalystBridge.expression(coalesce(text, lit("")))))

  /** The composable seven-pass formulation of [[scriptProfile]] — the
    * shape the DuckDB oracle states; kept for the parity spec. */
  def scriptProfileHof(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val n = length(t).cast("double")
    def frac(cls: String): Column =
      when(n > 0, round(length(regexp_replace(t, s"[^$cls]", "")) / n, 6))
        .otherwise(lit(0.0))
    val allCls = scriptRanges.map(_._2).mkString
    val other = when(n > 0,
      round(length(regexp_replace(t, s"[$allCls]", "")) / n, 6))
      .otherwise(lit(0.0))
    struct((scriptRanges.map { case (name, cls) => frac(cls).as(name) } :+
      other.as("other")): _*)
  }

  /** 64-bit content fingerprint of normalized text (whitespace-collapsed,
    * lowercased) — exact-dup detection key. */
  def contentFingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /**
   * Winnowing-style document fingerprint set (Schleimer et al., SIGMOD'03):
   * hash k-gram shingles, take the min hash in each sliding window of w —
   * compact, position-robust signature for near-dup / provenance checks.
   */
  def winnowedFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    CatalystBridge.column(WinnowedFps(CatalystBridge.expression(text), k, w))

  /** Unicode NFC normalization (codegen'd; see [[NativeText.nfc]]) — run
    * it before any hash-based dedup so canonically-equivalent text
    * (composed vs decomposed accents) collides as it should. */
  def nfcNormalize(text: Column): Column =
    CatalystBridge.column(NfcNormalize(CatalystBridge.expression(text)))

  /** Raw-DEFLATE byte length — the compression-ratio quality signal
    * (see [[DeflateSize]]'s determinism scope: in-run stable, not a
    * cross-engine contract). */
  def deflateSize(text: Column): Column =
    CatalystBridge.column(DeflateSize(CatalystBridge.expression(text)))

  /** Longest-common-subsequence length of two token arrays (ROUGE-L
    * core) — native rolling-DP expression, pure projection. */
  def lcsLength(a: Column, b: Column): Column =
    CatalystBridge.column(LcsLength(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Clipped multiset-intersection size Σ_t min(count_a(t), count_b(t))
    * of two token/gram arrays (the tokenF1/ROUGE-N/BLEU/chrF overlap
    * numerator) — native hash-count expression, pure projection. */
  def clippedOverlap(a: Column, b: Column): Column =
    CatalystBridge.column(ClippedOverlap(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Word-level Levenshtein distance of two token arrays (the WER/TER
    * numerator) — native rolling-DP expression, pure projection. */
  def tokenEditDistance(a: Column, b: Column): Column =
    CatalystBridge.column(TokenEditDistance(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Jaro-Winkler similarity of two strings (record-linkage name
    * comparator) — native expression, semantics pinned to DuckDB's
    * `jaro_winkler_similarity` (see [[JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    CatalystBridge.column(JaroWinkler(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  /** Normalized compression distance (Cilibrasi & Vitányi 2005):
    * NCD(a,b) = (C(ab) − min(C(a),C(b))) / max(C(a),C(b)) with C =
    * [[deflateSize]] — the parameter-free similarity that needs no
    * tokenizer, no embedding, no language assumption (the clustering-by-
    * compression signal for weird corpora: code, DNA-like strings,
    * mixed-script crawl). Same determinism scope as deflateSize:
    * in-run stable, not a cross-engine contract — gate it with
    * structural twins, not value oracles. Near 0 = near-duplicate,
    * ~1 = unrelated (can exceed 1 slightly; deflate is not a perfect
    * compressor). Three deflate passes per pair, all inside codegen. */
  def ncd(a: Column, b: Column): Column = {
    val ca = deflateSize(a)
    val cb = deflateSize(b)
    val cab = deflateSize(concat(a, b))
    round((cab - least(ca, cb)).cast("double") / greatest(ca, cb), 6)
  }

  /** Interpreted HOF formulation of winnowing — the executable spec the
    * native expression is pinned against (TextFunctionsSpec). */
  def winnowedFingerprintsHof(text: Column, k: Int = 5, w: Int = 4): Column = {
    val hashes = CatalystBridge.column( // positional (non-distinct) shingle hashes
      HashedShingles(CatalystBridge.expression(text), k, distinct = false))
    val nWin = size(hashes) - (w - 1)
    array_distinct(
      when(nWin > 0,
        transform(sequence(lit(0), nWin - 1), i => array_min(slice(hashes, i + 1, lit(w)))))
        .otherwise(array(array_min(hashes))))
  }

  /**
   * Simpson diversity 1 − Σ p² over the elements of `items` — the
   * repetition/junk signal (boilerplate and keyword-stuffed text score
   * near 0, natural text high) WITHOUT the transcendental-parity problem
   * Shannon entropy has across engines. Σ p² = (Σ n_d²)/N² where n_d are
   * per-distinct counts: Σ n_d² is summed in INTEGER space — exact,
   * order-free, partition-free — and exactly ONE float division happens
   * at the end, so any engine computing the same counts produces the
   * bit-identical double. Empty input → 0.
   *
   * Cost is O(|distinct| × |items|) per row — row-local, no shuffle;
   * fine for documents, size-cap upstream for megabyte blobs.
   */
  def simpsonDiversity(items: Column): Column = {
    val sumSq = aggregate(
      transform(array_distinct(items),
        d => size(filter(items, x => x === d)).cast("long")),
      lit(0L), (acc, c) => acc + c * c)
    val n = size(items).cast("long")
    when(size(items) === 0, lit(0.0))
      .otherwise(round(
        lit(1.0) - sumSq.cast("double") / (n * n).cast("double"), 6))
  }

  /** Character-level Simpson diversity of `text`, one native pass over
    * code points (`length`/`substr` semantics) — value-identical to
    * `simpsonDiversity` over the one-char substrings (spec-pinned) but
    * ~1000× cheaper than that interpreted O(|distinct|·n) HOF tree.
    * NULL text scores 0 (legacy `when` contract). */
  def charDiversity(text: Column): Column =
    coalesce(CatalystBridge.column(
      SimpsonChars(CatalystBridge.expression(text))), lit(0.0))

  /** Token-level Simpson diversity (whitespace tokens), native one-pass;
    * NULL text stays NULL (matching `simpsonDiversity(tokens(text))`). */
  def tokenDiversity(text: Column): Column =
    CatalystBridge.column(SimpsonTokens(CatalystBridge.expression(text)))

  /** DSIR hashed n-gram features (unigram + adjacent-bigram bucket ids,
    * engine-portable polynomial hash) — see [[NativeText.dsirBuckets]]. */
  def dsirBuckets(text: Column, buckets: Int): Column =
    CatalystBridge.column(
      DsirBuckets(CatalystBridge.expression(text), buckets))
}
