package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters of Spark 4's
  * unified Column API, for graft's custom Catalyst expressions
  * ([[graft.expressions.VectorDot]]). Lives in `org.apache.spark.sql` solely
  * for access; no Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
