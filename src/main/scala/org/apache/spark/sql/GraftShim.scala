package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` surface: wrap a raw Catalyst
  * `Expression` as a public `Column` (Spark 4 routes this through
  * `classic.ExpressionUtils`). This is the standard extension-library shim —
  * one line per direction, nothing else leaks out of the sql package.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
