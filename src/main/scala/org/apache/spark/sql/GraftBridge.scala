package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 backs `Column` by ColumnNode and scopes the converters
  * `private[sql]`, so the one-line adapters live in this package —
  * the standard extension-library technique (no Spark internals are
  * modified, only accessed). */
object GraftBridge {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
