package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters so the
  * engine's custom Catalyst expressions (graft.functions) can surface as
  * ordinary Columns. Lives in the org.apache.spark.sql package purely for
  * access scope — the standard pattern for Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully convert a functions-API Column into a Catalyst expression tree
    * via the ColumnNode converter — needed when a Column composition is
    * injected through the function registry, where the lazy
    * `ExpressionUtils.expression` wrapper would survive into the physical
    * plan and fail codegen. */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
