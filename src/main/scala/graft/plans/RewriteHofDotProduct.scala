package graft.plans


import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.DotProductExpr

/**
 * Catalyst optimizer rule: rewrite the canonical higher-order-function
 * dot product
 *
 * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
 *
 * into the codegen'd single-pass [[DotProductExpr]] (lenient mode).
 *
 * Why a Rule and not just a library function: the library's own APIs
 * already call [[DotProductExpr]] directly — this rule upgrades USER-
 * written plain-Spark HOF cosine/dot math (the formulation every Spark
 * how-to teaches) to the fused loop. Interpreted HOFs never enter
 * whole-stage codegen and re-evaluate per element through boxed lambdas,
 * so inside an O(pairs) scoring join the rewrite is a 3-5× kernel win
 * (measured for the signature family in round 2).
 *
 * The rewrite is semantics-preserving for EVERY input, not just
 * well-formed ones: lenient [[DotProductExpr]] yields null on mismatched
 * lengths — exactly what the HOF computes, since `zip_with` pads the
 * shorter side with nulls and the null poisons the sum. Null elements
 * and null arrays propagate identically. Matching is by lambda-variable
 * identity (exprId), commutative in both the multiply and the add, and
 * requires a foldable 0.0 seed and an identity finish lambda — anything
 * else is left untouched.
 */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def sameVars(vars: Seq[NamedLambdaVariable], l: Expression,
      r: Expression): Boolean = (l, r) match {
    case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
      vars.map(_.exprId).toSet == Set(lv.exprId, rv.exprId) &&
        lv.exprId != rv.exprId
    case _ => false
  }

  private def isZeroSeed(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => e.foldable && e.dataType == DoubleType &&
      e.eval() == 0.0
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg), _) =>
      arg match {
        case a: NamedLambdaVariable => a.exprId == v.exprId
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), prodVars, _)),
          seed,
          LambdaFunction(Add(ax, ay, _), addVars, _),
          finish)
        if isVec(a) && isVec(b) && isZeroSeed(seed) &&
          sameVars(prodVars.collect { case v: NamedLambdaVariable => v },
            mx, my) &&
          sameVars(addVars.collect { case v: NamedLambdaVariable => v },
            ax, ay) &&
          isIdentity(finish) =>
        DotProductExpr(a, b, lenient = true)
    }
}

// The session-extensions entry point lives in [[graft.GraftExtensions]]
// (one class injects the SQL function library and this rule together).
