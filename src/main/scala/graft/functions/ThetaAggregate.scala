package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketch, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * Theta sketches (Datasketches) — distinct counting that supports SET
 * OPERATIONS. HLL (q73/q74) unions mergeably but cannot intersect; a
 * theta sketch is a uniform hash sample of the distinct items, so
 * A ∩ B and A \ B have error-bounded estimates too. That is the
 * audience-overlap capability ("users who did BOTH") a pipeline cannot
 * get from per-segment HLLs or exact re-scans at 100 TB: persist one
 * theta sketch per segment at ingest, answer any overlap query later
 * from sketch algebra alone.
 *
 * Aggregates are [[TypedImperativeAggregate]]s with the live Union as
 * the buffer (serialized only at shuffle boundaries); intersection is
 * a SCALAR over two serialized sketches — per result row, off any hot
 * path — so arbitrary set expressions compose as columns. Below the
 * nominal-entries threshold (default 2^12 = 4096 distinct) a theta
 * sketch is in exact mode: estimates are exact and partitioning-
 * independent, which is what lets ThetaSketchSpec assert equalities
 * and the q79 gate stay deterministic at every test SF.
 */
object ThetaAggregate {

  val DefaultNominal: Int = 1 << 12

  /** `thetaBuild(value)`: aggregate raw values (long/int/string) into a
   * serialized compact theta sketch. */
  def thetaBuild(value: Column): Column =
    GraftExpressionBridge.toColumn(
      ThetaBuildAgg(GraftExpressionBridge.toExpression(value))
        .toAggregateExpression())

  /** `thetaUnion(sketch)`: union serialized theta sketches. */
  def thetaUnion(sketch: Column): Column =
    GraftExpressionBridge.toColumn(
      ThetaUnionAgg(GraftExpressionBridge.toExpression(sketch))
        .toAggregateExpression())

  /** `thetaIntersect(a, b)`: serialized intersection of two sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(
      ThetaIntersectExpr(GraftExpressionBridge.toExpression(a),
        GraftExpressionBridge.toExpression(b)))

  /** `thetaDiff(a, b)`: serialized difference A \ B of two sketches. */
  def thetaDiff(a: Column, b: Column): Column =
    GraftExpressionBridge.toColumn(
      ThetaDiffExpr(GraftExpressionBridge.toExpression(a),
        GraftExpressionBridge.toExpression(b)))

  /** `thetaEstimate(sketch)`: the sketch's distinct estimate. */
  def thetaEstimate(sketch: Column): Column =
    GraftExpressionBridge.toColumn(
      ThetaEstimateExpr(GraftExpressionBridge.toExpression(sketch)))

  private[functions] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))

  private[functions] def newUnion(): Union =
    SetOperation.builder().setNominalEntries(DefaultNominal).buildUnion()
}

/** Build aggregate: raw values in, serialized compact sketch out. The
 * buffer is a Union fed directly (it accepts raw updates), so partial
 * buffers merge without a separate sketch type. */
case class ThetaBuildAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  // analysis-time type check (update() pattern-matches exactly these;
  // ExpectsInputTypes/TypeCollection are private[sql] in Spark 4)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_build requires BIGINT/INT/STRING input, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Union = ThetaAggregate.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case s: org.apache.spark.unsafe.types.UTF8String => buf.update(s.toString)
      case other => buf.update(other.toString)
    }
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaAggregate.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaBuildAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): ThetaBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaBuildAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "theta_build"
}

/** Union aggregate: serialized sketches in, serialized union out. */
case class ThetaUnionAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_union requires a BINARY sketch input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Union = ThetaAggregate.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaAggregate.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: Union, b2: Union): Union = {
    b1.union(b2.getResult); b1
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaAggregate.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "theta_union"
}

/** Scalar intersection of two serialized sketches. */
case class ThetaIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "theta_intersect requires two BINARY sketch inputs")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i: Intersection = SetOperation.builder()
      .setNominalEntries(ThetaAggregate.DefaultNominal).buildIntersection()
    i.intersect(ThetaAggregate.wrap(a.asInstanceOf[Array[Byte]]))
    i.intersect(ThetaAggregate.wrap(b.asInstanceOf[Array[Byte]]))
    i.getResult.toByteArray
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersectExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_intersect"
}

/** Scalar difference A \ B of two serialized sketches (the third set
 * operation — with union and intersection the full audience algebra). */
case class ThetaDiffExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "theta_diff requires two BINARY sketch inputs")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(ThetaAggregate.wrap(a.asInstanceOf[Array[Byte]]),
        ThetaAggregate.wrap(b.asInstanceOf[Array[Byte]]))
      .toByteArray

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaDiffExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "theta_diff"
}

/** Scalar distinct estimate of a serialized sketch. */
case class ThetaEstimateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_estimate requires a BINARY sketch input, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    ThetaAggregate.wrap(bytes.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}
