package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Codegen'd double-precision dot product over two numeric array columns.
 *
 * Spark's higher-order functions (`zip_with` + `aggregate`) express the
 * same math but never enter whole-stage codegen — every element goes
 * through an interpreted lambda with boxing. For ANN / near-dup scoring
 * the dot product sits inside an O(candidate-pairs) loop, so this is THE
 * hot expression of the similarity stack; the generated code is a tight
 * primitive loop over `ArrayData` with no allocation.
 *
 * Semantics match the HOF formulation exactly: left-to-right summation in
 * double precision (bit-for-bit reproducible, DuckDB-oracle-portable).
 * Both inputs must have the same length (enforced by the caller — vectors
 * of one embedding column share a dimension).
 */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      sum += xv * yv
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) s"(double) $a.getFloat(i)"
        else s"$a.getDouble(i)"
      val rGet = if (elemIsFloat(right)) s"(double) $b.getFloat(i)"
        else s"$b.getDouble(i)"
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  sum += ($lGet) * ($rGet);
         |}
         |${ev.value} = sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** `Column` wrapper for [[DotProductExpr]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(DotProductExpr(
      GraftExpressionBridge.toExpression(a),
      GraftExpressionBridge.toExpression(b)))
}
