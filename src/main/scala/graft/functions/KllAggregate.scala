package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * Mergeable KLL quantile sketches (Datasketches, the library Spark
 * itself bundles for its HLL functions) — the rank/quantile counterpart
 * of q73's distinct-count rollup. The point at 100 TB is the same:
 * percentiles over raw rows need a sort (or a per-key dictionary), but
 * a per-segment KLL sketch is a few KB, mergeable WITHOUT re-touching
 * the rows, and bounds the normalized rank error by a k-dependent
 * constant (~1.65% at k=200) — so a pipeline can persist per-day/
 * per-shard sketches at ingest and answer "p95 over any date range"
 * from sketch unions alone.
 *
 * Both aggregates are [[TypedImperativeAggregate]]s — the mechanism
 * behind Spark's own hll_sketch_agg: the buffer is the live sketch
 * object, serialized only at shuffle/spill boundaries, never per row.
 * (A typed Dataset Aggregator with a binary encoder would re-serialize
 * the sketch on every update; an imperative UDAF is worse.)
 *
 * KLL compaction is randomized, so two different partitionings of the
 * same rows may yield slightly different (always error-bounded)
 * sketches. Anything gated cross-engine must therefore hash only exact
 * columns plus a TOLERANCE flag over the estimate — the q73 contract;
 * KllSketchSpec pins the bound, not bit-equality.
 */
object KllAggregate {

  /** `kllBuild(value, k)`: aggregate raw doubles into a serialized KLL
   * sketch (binary). */
  def kllBuild(value: Column, k: Int): Column =
    GraftExpressionBridge.toColumn(
      KllBuildAgg(GraftExpressionBridge.toExpression(value), k)
        .toAggregateExpression())

  /** `kllMerge(sketch)`: union serialized KLL sketches (binary). */
  def kllMerge(sketch: Column): Column =
    GraftExpressionBridge.toColumn(
      KllMergeAgg(GraftExpressionBridge.toExpression(sketch))
        .toAggregateExpression())

  /** `kllQuantile(sketch, q)`: the sketch's q-quantile (inclusive
   * search criterion — returns a value actually retained, so over an
   * integer-valued stream the result is one of the input integers). */
  def kllQuantile(sketch: Column, q: Double): Column =
    GraftExpressionBridge.toColumn(
      KllQuantileExpr(GraftExpressionBridge.toExpression(sketch), q))

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Build aggregate: doubles in, serialized sketch out. */
case class KllBuildAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"KLL k out of range: $k")

  // analysis-time type check: kllBuild over a non-double column must
  // fail in the analyzer, not as a mid-job ClassCastException
  // (AbstractDataType/ExpectsInputTypes are private[sql] in Spark 4,
  // so the check is spelled via checkInputDataTypes)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_build requires a DOUBLE input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified sketches are read-only in recent datasketches versions;
    // fold into a fresh writable instance so later merges are legal
    val fresh = createAggregationBuffer()
    fresh.merge(KllAggregate.heapify(bytes))
    fresh
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllBuildAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllBuildAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kll_build"
}

/** Merge aggregate: serialized sketches in, serialized union out. The
 * union's k is the minimum k across inputs (the datasketches rule). */
case class KllMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires a BINARY sketch input, got ${child.dataType.simpleString}")

  // start at max k: merging adopts the smallest k seen, so the neutral
  // element must not tighten anyone's accuracy
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(65535)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllAggregate.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: KllDoublesSketch, b2: KllDoublesSketch): KllDoublesSketch = {
    b1.merge(b2); b1
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val fresh = createAggregationBuffer()
    fresh.merge(KllAggregate.heapify(bytes))
    fresh
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "kll_merge"
}

/** Scalar quantile extraction from a serialized sketch. Runs once per
 * GROUP result (not per input row), so interpreted eval is fine — no
 * codegen needed off the hot path. */
case class KllQuantileExpr(child: Expression, q: Double)
    extends UnaryExpression with CodegenFallback {

  require(q >= 0.0 && q <= 1.0, s"quantile rank out of [0,1]: $q")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires a BINARY sketch input, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllAggregate.heapify(bytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null else sk.getQuantile(q)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantileExpr =
    copy(child = newChild)
  override def prettyName: String = "kll_quantile"
}
