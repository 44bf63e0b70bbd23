package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction for training-data pipelines — an extension
 * beyond the reference's surface (it has no text functions, SURVEY §2.4).
 *
 * Pure regex passes over the text column with Spark's codegen'd
 * `regexp_extract_all` / `regexp_replace`: detection and redaction are
 * each a single projection (no shuffle, no UDF), so the operators run at
 * scan speed at 100 TB and compose with filter pushdown.
 *
 * Patterns are restricted to syntax with identical semantics in Java's
 * regex engine and RE2 (character classes, bounded repetition, `\b`,
 * non-capturing groups) so the DuckDB oracle reproduces results exactly.
 * They are deliberately high-precision / moderate-recall document-scale
 * heuristics — the standard first-pass scrub before model-based PII
 * tagging.
 */
object Pii {

  /** RFC-5322-lite email addresses. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no octet range check). */
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** US-style SSN: 3-2-4 digit groups, dash-separated. */
  val ssnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** US-style phone: 3-3-4 digit groups, dash or dot separated. */
  val phonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  private val categories: Seq[(String, String, String)] = Seq(
    // Redaction ORDER matters and is part of the contract: email first
    // (its local part may contain digit runs), then SSN before phone
    // (both are dashed digit groups; 3-2-4 must not be consumed as a
    // partial phone), then IP last.
    ("email", emailPattern, "[EMAIL]"),
    ("ssn", ssnPattern, "[SSN]"),
    ("phone", phonePattern, "[PHONE]"),
    ("ip", ipv4Pattern, "[IP]"))

  /** Per-category match counts: `n_email`, `n_ssn`, `n_phone`, `n_ip`,
    * plus `has_pii` — one codegen'd projection. */
  def detect(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = categories.map { case (name, pat, _) =>
      size(regexp_extract_all(col(textCol), lit(pat), lit(0))).as(s"n_$name")
    }
    df.select(col(idCol) +: counts: _*)
      .withColumn("has_pii",
        categories.map(c => col(s"n_${c._1}") > 0).reduce(_ || _))
  }

  /** Text with every PII match replaced by its category placeholder,
    * applying the category passes in the documented order. */
  def redactText(text: Column): Column =
    categories.foldLeft(text) { case (acc, (_, pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** (id, redacted text) — the scrub pass. */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), redactText(col(textCol)).as(textCol))

  /**
   * Keyed pseudonymization: replace identifier columns with
   * `sha256(salt ‖ value)` hex — stable within a salt (joins and
   * group-bys still line up across tables pseudonymized with the same
   * salt), unlinkable without it, and irreversible. The salt must be
   * secret and long: with a guessable salt, low-entropy identifiers
   * (user ids, emails) fall to dictionary re-identification.
   *
   * Pure per-row projection (codegen'd sha2) — no shuffle, pushes
   * through scans like any expression; NULLs stay NULL.
   */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      when(col(c).isNotNull,
        sha2(concat(lit(salt), col(c).cast("string")), 256))))

  /**
   * k-anonymity audit over quasi-identifier columns: every combination
   * of quasi-identifier values observed in fewer than k rows is a
   * re-identification risk (those rows are distinguishable by the
   * combination alone) — the standard check before releasing a dataset
   * keyed on demographic-like columns. Returns the violating
   * equivalence classes `(quasiCols..., n)`, empty ⇒ the dataset IS
   * k-anonymous on those columns. NULL counts as a quasi-identifier
   * value (SQL GROUP BY semantics): an absent value distinguishes a
   * row as well as a present one.
   *
   * One map-side-combined aggregation — the report is bounded by the
   * number of RARE combinations, not corpus size. Pair with
   * [[pseudonymize]]/generalization to repair, then re-audit.
   */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(k >= 2, "k < 2 is vacuous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /**
   * l-diversity audit (Machanavajjhala 2007) — k-anonymity's
   * complement: an equivalence class whose rows all share ONE sensitive
   * value leaks that value even when the class is large. Returns the
   * classes `(quasiCols..., n, n_sensitive)` whose count of DISTINCT
   * sensitive values is below `l`; empty ⇒ the dataset is l-diverse on
   * that column. NULL quasi-identifier values group as real levels
   * (same as [[kAnonymityViolations]]); NULL sensitive values do NOT
   * count as a level (SQL COUNT DISTINCT semantics) — an all-NULL
   * class reports `n_sensitive = 0`.
   *
   * Same single map-side-combined aggregation shape; output bounded by
   * the number of low-diversity classes, not corpus size.
   */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    require(l >= 2, "l < 2 is vacuous")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
  }

  /**
   * Corpus-level PII exposure report — the audit run BEFORE deciding to
   * scrub: one row per category, `(category, n_docs, n_matches,
   * doc_frac)` where `n_docs` counts documents containing ≥1 match,
   * `n_matches` total occurrences, `doc_frac` the document share
   * rounded to 6 dp. Categories always present (zero rows included) in
   * the documented redaction order, `category` index-prefixed so the
   * report sorts in that order.
   *
   * Scale shape: the [[detect]] projection (codegen'd regex counts)
   * followed by ONE global map-side-combined aggregate and a
   * #categories-sized unpivot — no shuffle of document data.
   */
  def detectionReport(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val d = detect(df, idCol, textCol)
    val aggs = count(lit(1)).as("__n") +: categories.flatMap { case (c, _, _) =>
      Seq(count(when(col(s"n_$c") > 0, 1)).as(s"__d_$c"),
        sum(col(s"n_$c").cast("long")).as(s"__m_$c"))
    }
    val structs = array(categories.zipWithIndex.map { case ((c, _, _), i) =>
      struct(lit(s"${i + 1}_$c").as("category"),
        col(s"__d_$c").as("n_docs"), col(s"__m_$c").as("n_matches"))
    }: _*)
    d.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(structs).as("s"))
      .select(col("s.category").as("category"), col("s.n_docs").as("n_docs"),
        col("s.n_matches").as("n_matches"),
        round(col("s.n_docs").cast("double") / col("__n"), 6).as("doc_frac"))
  }

  /**
   * Laplace-noised group counts — the differential-privacy release
   * mechanism for publishing per-key tallies (Dwork et al. 2006): each
   * count gets additive Laplace(1/ε) noise (count queries have L1
   * sensitivity 1), `(key, n, noisy_n)`.
   *
   * SEEDING CAVEAT, stated honestly: the noise draw is a DETERMINISTIC
   * hash of (seed, key) — a reproducible release the pipeline can
   * replay and the oracle can verify, which is an engineering
   * compromise: against an adversary who learns the seed this is NOT
   * differential privacy (the noise is recomputable). Rotate the seed
   * per release and guard it like the data. The Laplace inverse-CDF
   * itself is exact: u ∈ (0,1) from 24 md5 bits (cell-center offset
   * keeps the log argument strictly positive),
   * noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|).
   *
   * Scale shape: one map-side-combined count per key + a pure
   * projection; the noise hash is the same engine-portable
   * `conv(md5)` nibble arithmetic as [[Split.kFoldColumn]]. ln snaps
   * once to 9 dp (the repo's transcendental discipline); published
   * noisy counts round to 6 dp.
   */
  def noisyCounts(df: DataFrame, keyCol: String, epsilon: Double,
                  seed: String = "graft-dp"): DataFrame = {
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val v = conv(substring(md5(concat(lit(seed), lit(":"), col("key"))),
      1, 6), 16, 10).cast("double")
    val u = (v + lit(0.5)) / lit(16777216.0) // 16^6; strictly inside (0,1)
    val c = u - lit(0.5)
    val noise = round(lit(-1.0 / epsilon) * signum(c) *
      round(log(lit(1.0) - lit(2.0) * abs(c)), 9), 9)
    counts.select(col("key"), col("n"),
      round(col("n") + noise, 6).as("noisy_n"))
  }
}
