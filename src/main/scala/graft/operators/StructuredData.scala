package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Structured-payload screening for training data: tool-call traces,
 * function-call arguments, and JSON-mode generations are only usable if
 * they PARSE, and the standard curation step is "flag/drop rows whose
 * payload is malformed, extract the routed-on fields from the rest".
 *
 * Validity is `get_json_object(x, '$')` non-null — Spark's Jackson-strict
 * parse (scalars are valid JSON documents, truncated/unquoted forms are
 * not), matching DuckDB `json_valid` on everything the oracle runs.
 *
 * Scale shape: pure codegen'd projections — no shuffle, no UDF; the
 * JSONPath evaluation is Spark's built-in (one parse per row shared
 * across paths by subexpression elimination at the Jackson level is NOT
 * guaranteed — for many-path extraction over huge corpora prefer
 * `from_json` with an explicit schema; this operator targets the 1-3
 * field screening pass).
 */
object StructuredData {

  /** `(idCol, is_valid_json)` — does the payload parse as JSON? */
  def jsonValidity(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol),
      get_json_object(col(jsonCol), "$").isNotNull.as("is_valid_json"))

  /**
   * `(idCol, <alias...>)` — JSONPath string extraction per (alias, path)
   * pair, in the given order; malformed payloads and missing paths yield
   * NULL (they are indistinguishable downstream on purpose — both mean
   * "don't route on this field").
   */
  def extractFields(df: DataFrame, idCol: String, jsonCol: String,
                    fields: Seq[(String, String)]): DataFrame =
    df.select(col(idCol) +: fields.map { case (alias, path) =>
      get_json_object(col(jsonCol), path).as(alias)
    }: _*)
}
