package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column↔Expression conversions
 * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x). Lives under
 * `org.apache.spark.sql` solely to satisfy the `private[sql]` access
 * qualifier — the standard technique for libraries shipping native Catalyst
 * expressions without forking Spark. Everything else in this project stays
 * in the `graft` namespace.
 *
 * This lets graft's custom expressions (e.g. graft.functions.SimHash64) be
 * used as `Column`s on ANY SparkSession — no SparkSessionExtensions or
 * function-registry mutation required (those remain available for SQL-name
 * registration via graft.GraftExtensions).
 */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a composed Column's node tree into a concrete
    * Catalyst expression. `expression` wraps the tree lazily
    * (`ColumnNodeExpression`, Unevaluable) — fine inside Dataset ops,
    * which convert on resolution, but an expression handed straight to
    * the FunctionRegistry (GraftExtensions' composed SQL functions) never
    * goes through that path and must be converted up front. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
