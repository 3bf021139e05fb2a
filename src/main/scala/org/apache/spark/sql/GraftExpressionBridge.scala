package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression conversion (Spark 4
  * routes Columns through ColumnNode, so library code needs this one-line
  * shim in the sql package to attach a custom Catalyst Expression — the
  * same technique Spark extension libraries use). */
object GraftExpressionBridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
