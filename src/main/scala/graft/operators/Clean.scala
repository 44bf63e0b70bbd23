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

  /** Standard junk-null spellings → real NULL (case-insensitive). */
  val defaultNullTokens: Seq[String] = Seq("", "null", "n/a", "na", "none", "-")

  def nullify(c: Column, tokens: Seq[String] = defaultNullTokens): Column =
    when(lower(trim(c)).isin(tokens.map(_.toLowerCase): _*), lit(null)).otherwise(c)

  /** Cast-with-fallback: value if it parses as `dt`, else NULL (DuckDB
    * TRY_CAST parity; under ANSI mode a plain cast would throw). */
  def tryCast(c: Column, dt: String): Column = c.try_cast(dt)

  /**
   * Clean every string column in one pass: whitespace-normalize +
   * nullify junk spellings. Non-string columns pass through.
   */
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
