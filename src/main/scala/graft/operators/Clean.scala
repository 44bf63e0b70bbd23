package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Column-cleaning primitives — the deterministic core of what the
 * reference's users do via LLM-generated SQL (it is a data-cleaning
 * tool): whitespace/null normalization and guarded type coercion, all
 * pure codegen built-ins (no UDFs), so cleaning a 100 TB table is one
 * scan with full pushdown upstream.
 */
object Clean {

  /** Collapse runs of whitespace to single spaces and trim. */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Line-ending normalization for crawl text: CRLF/CR → LF, trailing
    * per-line whitespace dropped, 3+ blank lines collapsed to one blank
    * (paragraph break preserved) — run BEFORE any line-keyed operator
    * ([[Lines]], duplicate-line fractions) so `a\r\n` and `a\n` count as
    * the same line. Pure regex chain in the portable subset. */
  def normalizeNewlines(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "\\r\\n?", "\n"),
      "[ \\t]+\\n", "\n"),
      "\\n{3,}", "\n\n")

  /** Standard junk-null spellings → real NULL (case-insensitive). */
  val defaultNullTokens: Seq[String] = Seq("", "null", "n/a", "na", "none", "-")

  def nullify(c: Column, tokens: Seq[String] = defaultNullTokens): Column =
    when(lower(trim(c)).isin(tokens.map(_.toLowerCase): _*), lit(null)).otherwise(c)

  /** Cast-with-fallback: value if it parses as `dt`, else NULL (DuckDB
    * TRY_CAST parity; under ANSI mode a plain cast would throw). */
  def tryCast(c: Column, dt: String): Column = c.try_cast(dt)

  /** Canonical key for normalized-exact dedup: lowercase, punctuation →
    * space (`\p{L}\p{N}` kept, so non-Latin scripts survive), whitespace
    * collapsed — catches duplicates that differ only in case/punctuation/
    * spacing. Unicode-property regex is shared Java/RE2 syntax, so the
    * key is engine-portable. */
  def dedupKey(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))

  // ---- PII scrubbing --------------------------------------------------
  // Patterns deliberately stick to the regex subset Java and RE2 agree
  // on (char classes, bounded repeats, \b) — no lookaround, no
  // backreferences — so the same patterns run anywhere.

  /** user@domain.tld (the practical superset form). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — octet range not enforced). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long digit runs (account/card/SSN-shaped identifiers). */
  val LongDigitPattern = "\\b\\d{9,}\\b"

  /**
   * Redact PII-shaped substrings with typed placeholder tokens.
   * Order matters: emails first (their local parts may contain digit
   * runs), then IPs (dotted quads would otherwise partially match the
   * digit rule), then bare digit runs. One codegen'd projection — the
   * 100 TB cost is the scan, as with every cleaner here.
   */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      LongDigitPattern, "<NUMBER>")

  /**
   * Clean every string column in one pass: whitespace-normalize +
   * nullify junk spellings. Non-string columns pass through.
   */
  // ---- encoding-damage detection ---------------------------------------

  /** U+FFFD — what lossy decoders emit for undecodable bytes. */
  private val ReplacementChar = "�"

  /** The classic UTF-8-read-as-Latin-1 digraphs: 'Ã'+vowel rows (é è ä
    * ö ü ñ á í ó ú), the 'â€¦' smart-punctuation family, and NBSP as
    * 'Â '. Literal alternation — identical semantics in Java regex and
    * RE2, no class-escape parity risk. */
  private val MojibakePattern =
    Seq("Ã©", "Ã¨", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Ã¡", "Ã­", "Ã³", "Ãº",
      "â€™", "â€œ", "â€", "â€“", "â€”", "â€¦", "Â ").mkString("|")

  /**
   * Encoding-damage audit — the pretraining-cleanup signal nobody
   * sees until a model emits 'Ã©' for 'é': per document, counts of
   * U+FFFD replacement characters (lossy decode happened upstream) and
   * of the classic UTF-8-decoded-as-Latin-1 digraphs (double-encoding
   * happened upstream), plus the combined flag. Flagged documents
   * should be re-decoded from source, not "cleaned" — the information
   * is already gone.
   *
   * Pure projection (streaming-legal); counts via `regexp_extract_all`
   * size so the identical pattern runs in the DuckDB oracle.
   */
  def mojibakeAudit(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(ReplacementChar), lit(0)))
        .cast("long").as("n_replacement"),
      size(regexp_extract_all(t, lit(MojibakePattern), lit(0)))
        .cast("long").as("n_mojibake"))
      .withColumn("damaged",
        col("n_replacement") > 0 || col("n_mojibake") > 0)
  }

  def cleanStrings(df: DataFrame,
                   tokens: Seq[String] = defaultNullTokens): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == StringType)
        nullify(normalizeWhitespace(col(f.name)), tokens).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
