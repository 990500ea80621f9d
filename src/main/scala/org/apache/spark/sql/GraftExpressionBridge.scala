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

  /** Eagerly lower a Column tree to a Catalyst expression. When a session
   * is active its converter resolves function column-nodes (needed when
   * the result is spliced into a plan by a FunctionRegistry builder — the
   * analyzer won't re-visit nested lazy ColumnNodeExpressions there);
   * otherwise fall back to the lazy wrapper. */
  def toExpression(c: Column): Expression =
    SparkSession.getActiveSession match {
      case Some(s: classic.SparkSession) => s.expression(c)
      case _ => classic.ExpressionUtils.expression(c)
    }

  /** Test hook: the rules a `SparkSessionExtensions` instance would
   * inject (`buildOptimizerRules` is `private[sql]`). */
  def injectedOptimizerRules(ext: SparkSessionExtensions,
      s: SparkSession): Seq[
        org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(s)
}
