package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftExpressionBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.Expression
import graft.functions.{DotProductExpr, TextFunctions, Transforms, VectorFunctions}

/**
 * SQL surface for the engine's function library: every Column combinator
 * registered as a session function, so `spark.sql("SELECT
 * graft_date_ymd(key_date) …")` works exactly like the DataFrame API —
 * the registered builder re-expresses the same Catalyst tree, so plans,
 * codegen and results are identical in both dialects.
 *
 * [[GraftExtensions]] is the `spark.sql.extensions` entry point
 * (SparkSession.builder().withExtensions(new GraftExtensions) or
 * --conf spark.sql.extensions=graft.GraftExtensions).
 */
object GraftFunctions {

  /** name → (arity, Column-level implementation). */
  val unary: Map[String, Column => Column] = Map(
    "graft_lenient_int" -> Transforms.lenientInt,
    "graft_date_ymd" -> Transforms.dateStrToYmdInt,
    "graft_epoch_ymd" -> Transforms.epochToYmdInt,
    "graft_semi_split" -> Transforms.semiSplit,
    "graft_norm_text" -> TextFunctions.normalizeText,
    "graft_tokens" -> TextFunctions.tokens,
    "graft_token_count" -> TextFunctions.tokenCount,
    "graft_bpe_count" -> TextFunctions.bpeTokenCount,
    "graft_hash60" -> TextFunctions.hash60,
    "graft_fingerprint" -> TextFunctions.fingerprint,
    "graft_lang_id" -> TextFunctions.langId,
    "graft_quality" -> TextFunctions.qualityScore,
    "graft_punct_ratio" -> TextFunctions.punctRatio,
    "graft_redact_pii" -> TextFunctions.redactPii,
    "graft_simhash" -> (c => graft.operators.Dedup.simHash(c, 16)),
    "graft_minhash" -> (c => graft.operators.Dedup.minHashSig(c, 16)))

  val binary: Map[String, (Column, Column) => Column] = Map(
    "dot_product" -> ((a, b) => VectorFunctions.dot(a, b)),
    "cosine_sim" -> ((a, b) => VectorFunctions.cosine(a, b)))

  private def asBuilder1(f: Column => Column): Seq[Expression] => Expression =
    es => toExpression(f(toColumn(es.head)))
  private def asBuilder2(
      f: (Column, Column) => Column): Seq[Expression] => Expression =
    es => toExpression(f(toColumn(es.head), toColumn(es(1))))

  /** Register everything on an existing session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    unary.foreach { case (name, f) =>
      reg.createOrReplaceTempFunction(name, asBuilder1(f), "scala_udf")
    }
    binary.foreach { case (name, f) =>
      reg.createOrReplaceTempFunction(name, asBuilder2(f), "scala_udf")
    }
    // dot_product also as the raw codegen'd expression (no Column detour)
    reg.createOrReplaceTempFunction("dot_product",
      es => DotProductExpr(es.head, es(1)), "scala_udf")
  }
}

/** spark.sql.extensions hook — injects the function library AND the
 * library's Catalyst optimizer rules at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    GraftFunctions.unary.foreach { case (name, f) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) =>
          GraftExpressionBridgeAccess.toExpression(
            f(GraftExpressionBridgeAccess.toColumn(es.head)))))
    }
    GraftFunctions.binary.foreach { case (name, f) =>
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (es: Seq[Expression]) =>
          GraftExpressionBridgeAccess.toExpression(
            f(GraftExpressionBridgeAccess.toColumn(es.head),
              GraftExpressionBridgeAccess.toColumn(es(1))))))
    }
  }
}

/** Indirection so the extension class has no hard init-order dependency. */
private object GraftExpressionBridgeAccess {
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.GraftExpressionBridge.toColumn(e)
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.GraftExpressionBridge.toExpression(c)
}
