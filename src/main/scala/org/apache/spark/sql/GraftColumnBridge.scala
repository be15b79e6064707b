package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge so the graft library can lift custom Catalyst
  * Expressions into the public Column API (ExpressionUtils is
  * private[sql]; this is the conventional pattern for Spark extension
  * libraries that ship native expressions).
  */
object GraftColumnBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
