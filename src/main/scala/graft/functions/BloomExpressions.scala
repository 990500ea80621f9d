package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_contains_any(bloom, hashes)` — true iff the serialized Spark
 * [[BloomFilter]] in the binary column might contain ANY of the 64-bit
 * hashes in the array column.
 *
 * Exists because Spark's own `might_contain` (`BloomFilterMightContain`,
 * the runtime-filter predicate) requires its bloom argument to be
 * FOLDABLE or a scalar subquery — it evaluates one filter against many
 * rows. The data-skipping sidecar ([[graft.operators.SkippingIndex]])
 * needs the transpose: many filters (one PER ROW, one row per data
 * file) each probed with a small set of hashes, evaluated on the
 * EXECUTORS so pruning a 100k-file sidecar never moves filter bytes to
 * the driver. Each row deserializes its own filter once and probes all
 * hashes — the deserialization is per-file metadata work, exactly what
 * the old driver-side loop paid, now distributed.
 *
 * Null bloom or null hash array yields null (BinaryExpression default);
 * hash elements are produced by `transform` over a literal probe array
 * and are never null.
 */
case class BloomContainsAnyExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_contains_any"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_contains_any needs (binary, array<bigint>), got ($l, $r)")
    }
  }

  override def nullSafeEval(b: Any, h: Any): Any =
    BloomContainsAnyExpr.containsAny(
      b.asInstanceOf[Array[Byte]], h.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomContainsAnyExpr.containsAny($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsAnyExpr =
    copy(left = newLeft, right = newRight)
}

object BloomContainsAnyExpr {
  /** Static helper shared by eval and generated code. */
  def containsAny(bytes: Array[Byte], hashes: ArrayData): Boolean = {
    val bf = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      if (bf.mightContainLong(hashes.getLong(i))) return true
      i += 1
    }
    false
  }
}
