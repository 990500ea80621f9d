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
 * Mismatched vector lengths raise (a malformed embedding must fail loudly,
 * not score as a silent prefix dot); a null ELEMENT yields a null result —
 * the same null the `zip_with`/`aggregate` form propagates. The null scan
 * is only emitted when the array type says elements can be null, so the
 * codegen'd hot loop stays branch-free for non-null vectors.
 */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs array<float|double>, got $t")
  }

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"dot_product: vector length mismatch ${x.numElements()} vs ${y.numElements()}")
    val n = x.numElements()
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val checkNulls = elemNullable(left) || elemNullable(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
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
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt(i) || $b.isNullAt(i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: vector length mismatch " + $a.numElements() +
         |    " vs " + $b.numElements());
         |}
         |int n = $a.numElements();
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  $nullCheck
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
