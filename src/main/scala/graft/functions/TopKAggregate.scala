package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Grouped top-k as a bounded-heap aggregate.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy
  * (score))` then `rank <= k`) materializes and SORTS every group in
  * full before discarding all but k rows — at 100 TB that is a sort
  * of the corpus to keep a sliver. This aggregate carries O(k) state
  * per group through the normal partial-aggregation machinery
  * instead: map-side heaps absorb each partition's rows before the
  * shuffle (the exchange moves at most k rows per (partition, group)),
  * merge is heap-union, and no sort larger than k ever happens.
  * Semantics are pinned to the window form: order by (score DESC,
  * id ASC), deterministic under ties, null scores/ids skipped.
  *
  * This is the engine's `TypedImperativeAggregate` exemplar (the
  * catalyst aggregate extension point, same mechanism as
  * percentile_approx/collect_list): serialize/deserialize shuttle the
  * heap through the partial-merge-final pipeline.
  */
object TopKAggregate {

  /** Heap entry badness: bigger = worse. Worst = lowest score, then
    * LARGEST id (so ties keep the smallest ids, matching
    * row_number over (score DESC, id ASC)).
    */
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[
        mutable.PriorityQueue[(Double, Long)]] {

    require(k > 0, s"topK: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer()
        : mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

    private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                      e: (Double, Long)): Unit = {
      if (buf.size < k) buf.enqueue(e)
      else if (worstFirst.compare(e, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(e)
      }
    }

    override def update(buf: mutable.PriorityQueue[(Double, Long)],
                        input: InternalRow)
        : mutable.PriorityQueue[(Double, Long)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
      }
      buf
    }

    override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                       other: mutable.PriorityQueue[(Double, Long)])
        : mutable.PriorityQueue[(Double, Long)] = {
      other.foreach(offer(buf, _))
      buf
    }

    override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
      // ascending badness == best first
      val sorted = buf.toArray.sorted(worstFirst)
      new GenericArrayData(sorted.map { case (s, i) =>
        InternalRow(s, i)
      }.toArray[Any])
    }

    override def serialize(buf: mutable.PriorityQueue[(Double, Long)])
        : Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte])
        : mutable.PriorityQueue[(Double, Long)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var j = 0
      while (j < n) {
        buf.enqueue((bb.getDouble, bb.getLong))
        j += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int)
        : TopKByScore = copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int)
        : TopKByScore = copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(score = newChildren(0), id = newChildren(1))
  }

  /** Column form: array of (score, id) structs, best-first, size ≤ k.
    * `score` must be DoubleType and `id` LongType (cast beforehand).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    toColumn(TopKByScore(toExpression(score), toExpression(id), k)
      .toAggregateExpression())
}
