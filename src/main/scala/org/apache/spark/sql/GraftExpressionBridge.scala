package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark's Column↔Expression conversion, which is
 * `private[sql]` in Spark 4 (`org.apache.spark.sql.classic.
 * ExpressionUtils`). Custom Catalyst expressions (graft.functions.
 * VectorExpressions) need exactly these two hooks and nothing else.
 */
object GraftExpressionBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
