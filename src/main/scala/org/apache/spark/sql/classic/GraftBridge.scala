package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Narrow bridge into Spark's `private[sql]` Column ↔ catalyst
  * Expression conversion, used to expose graft's native codegen
  * expressions (graft.functions.DotProduct) as ordinary Columns.
  * This is the same mechanism `org.apache.spark.sql.functions` uses
  * internally; no Spark behavior is modified.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
