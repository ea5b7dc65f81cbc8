package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 removed the public `Column(expr)` constructor in the Connect
  * refactor; `org.apache.spark.sql.classic.ExpressionUtils` is the classic
  * path). This is the only file outside the `graft` namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
