package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must rewrite the canonical HOF dot product into the
 * codegen'd expression WITHOUT changing any observable semantics —
 * including the null-on-mismatch behavior the HOF form has. Behavior runs
 * on an isolated `newSession` with the rule installed through the public
 * `experimental.extraOptimizations` hook (a conf-built session with
 * `spark.sql.extensions` cannot be constructed here: the suite JVM already
 * holds a session, and extensions bind only at construction); the
 * `GraftExtensions` wiring itself is asserted against a fresh
 * `SparkSessionExtensions` instance. */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = graft.TestSpark.spark.newSession()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ RewriteHofDotProduct
    s
  }

  test("GraftExtensions injects the rewrite rule") {
    val ext = new SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftExpressionBridge
      .injectedOptimizerRules(ext, graft.TestSpark.spark)
    assert(rules.contains(RewriteHofDotProduct),
      s"expected RewriteHofDotProduct among injected rules: $rules")
  }

  // range-based (NOT a local relation — constant folding would evaluate
  // a literal-backed plan before the rule's effect is observable):
  // a = [1,2,3]; b = [2,4,6], except id 3 where b is length 2 (mismatch)
  private def hofDot = {
    val blen = when(col("id") === 3, lit(2)).otherwise(lit(3))
    spark.range(1, 4)
      .select(col("id"),
        transform(sequence(lit(1), lit(3)), x => x.cast("double")).as("a"),
        transform(sequence(lit(1), blen),
          x => x.cast("double") * 2).as("b"))
      .select(col("id"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v).as("dot"))
  }

  test("HOF dot product is rewritten to the codegen'd expression") {
    val plan = hofDot.queryExecution.optimizedPlan.toString()
    assert(plan.toLowerCase.contains("dotproductexpr"),
      s"expected DotProductExpr in optimized plan:\n$plan")
    assert(!plan.contains("aggregate(zip_with"),
      s"HOF form survived optimization:\n$plan")
  }

  test("rewritten plan computes HOF-identical results incl. mismatch→null") {
    val rows = hofDot.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows(1L) == 28.0) // 1*2 + 2*4 + 3*6
    assert(rows(2L) == 28.0)
    assert(rows(3L) == null, "mismatched lengths must yield null, not throw")
  }

  test("non-dot HOF aggregates are left untouched") {
    // (x - y) * (x - y) is not the dot pattern — must not be rewritten
    val sq = spark.range(1, 2)
      .select(
        transform(sequence(lit(1), lit(2)), x => x.cast("double")).as("a"),
        transform(sequence(lit(1), lit(2)),
          x => x.cast("double") * 2).as("b"))
      .select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("sq"))
    val plan = sq.queryExecution.optimizedPlan.toString()
    assert(!plan.toLowerCase.contains("dotproductexpr"))
    assert(sq.collect().head.getDouble(0) == 5.0) // 1 + 4
  }
}
