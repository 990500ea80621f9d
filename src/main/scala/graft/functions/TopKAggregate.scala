package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Bounded top-k aggregate over (score double, id long) pairs: keeps the k
 * best (score desc, id asc on ties) in a fixed-size heap.
 *
 * This is the scalable form of "rank per group and filter rank ≤ k":
 * a window `row_number` must SORT every candidate row of a group after a
 * full shuffle, while this aggregate is a partial — each map task reduces
 * its candidates to ≤ k pairs before the exchange, so the shuffle carries
 * O(groups × k) instead of O(candidates). At ANN scale (candidates per
 * query ≫ k) that is the difference between shuffling the scored corpus
 * and shuffling the answer.
 */
case class TopKPairsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // worst element first (min-heap by score, ties: larger id is worse)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    } // "a > b" in quality ⇒ reversed ordering puts worst at head

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) {
        add(buf, (row.getDouble(0), row.getLong(1)))
      }
    }
    buf
  }

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
      p: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    // head is the worst kept pair (the ordering's max); replace it when
    // p is better, i.e. strictly less in this reversed ordering
    else if (worstFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(p => add(b1, p))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy(p => (-p._1, p._2)) // best first
    new GenericArrayData(sorted.map(p => InternalRow(p._1, p._2)))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk_pairs"
}

object TopKAggregate {
  /** `topKPairs(struct(score, id), k)` as a Column aggregate. */
  def topKPairs(pair: Column, k: Int): Column =
    GraftExpressionBridge.toColumn(
      TopKPairsAgg(GraftExpressionBridge.toExpression(pair), k)
        .toAggregateExpression())
}
