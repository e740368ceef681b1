package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> Catalyst Expression bridge `private[sql]`
  * (Column is now backed by ColumnNode for Connect compatibility). This
  * shim re-exports the two conversions a Catalyst-extending library needs,
  * from inside the `org.apache.spark.sql` namespace.
  */
object bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
