package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column internals — the supported
  * pattern for third-party Catalyst extensions (Spark 4 moved Column onto
  * ColumnNode; `classic.ExpressionUtils` is the conversion point). Only
  * pure conversions live here; all graft logic stays in `graft.*`.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
