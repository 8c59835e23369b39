package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression converters (the
  * Column(expr) constructor was removed in Spark 4's Connect refactor).
  * Lives under org.apache.spark.sql so custom Catalyst expressions in
  * graft.* can be exposed as user-facing Columns. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
