package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.SqlShims.{toColumn, toExpression, AbstractType, AnyType}
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
  * payload ASC), deterministic under ties, null scores/payloads
  * skipped.
  *
  * The payload (`id`) is ANY orderable type — long ids, string doc
  * ids, or a struct carrying whole rows through the heap — ordered by
  * Spark's interpreted ordering for tie-breaks and shuttled through
  * serialize/merge as UnsafeRow bytes. Scores order by
  * `java.lang.Double.compare`, so NaN ranks GREATEST (best under
  * DESC) exactly like Spark's sort in the window form. Int/decimal
  * scores via the SQL surface (`graft_topk`) implicit-cast to double
  * at analysis time rather than failing at execution (r5 advice).
  *
  * This is the engine's `TypedImperativeAggregate` exemplar (the
  * catalyst aggregate extension point, same mechanism as
  * percentile_approx/collect_list): serialize/deserialize shuttle the
  * heap through the partial-merge-final pipeline.
  */
object TopKAggregate {

  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[
        mutable.PriorityQueue[(Double, Any)]]
      with ImplicitCastInputTypes {

    require(k > 0, s"topK: k must be positive, got $k")

    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def inputTypes: Seq[AbstractType] =
      Seq(DoubleType, AnyType)

    override def checkInputDataTypes(): TypeCheckResult = {
      val base = super.checkInputDataTypes()
      if (base.isFailure) base
      else if (!RowOrdering.isOrderable(id.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk payload type ${id.dataType.catalogString} " +
            "is not orderable")
      else TypeCheckResult.TypeCheckSuccess
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("score", DoubleType, nullable = false),
        StructField("id", id.dataType, nullable = false))),
      containsNull = false)

    @transient private lazy val idOrdering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(id.dataType)

    /** Heap entry badness: bigger = worse. Worst = lowest score
      * (java.lang.Double.compare — NaN sorts greatest, i.e. best,
      * matching the window form's DESC), then LARGEST payload (so
      * ties keep the smallest payloads, matching row_number over
      * (score DESC, payload ASC)).
      */
    @transient private lazy val worstFirst: Ordering[(Double, Any)] =
      new Ordering[(Double, Any)] {
        override def compare(x: (Double, Any), y: (Double, Any)): Int = {
          val c = java.lang.Double.compare(y._1, x._1)
          if (c != 0) c else idOrdering.compare(x._2, y._2)
        }
      }

    override def createAggregationBuffer()
        : mutable.PriorityQueue[(Double, Any)] =
      mutable.PriorityQueue.empty[(Double, Any)](worstFirst)

    private def offer(buf: mutable.PriorityQueue[(Double, Any)],
                      e: (Double, Any)): Unit = {
      if (buf.size < k) buf.enqueue(e)
      else if (worstFirst.compare(e, buf.head) < 0) {
        buf.dequeue(); buf.enqueue(e)
      }
    }

    override def update(buf: mutable.PriorityQueue[(Double, Any)],
                        input: InternalRow)
        : mutable.PriorityQueue[(Double, Any)] = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        // copy: non-primitive payloads (UTF8String, structs) point
        // into buffers the scan reuses for the next row
        offer(buf, (s.asInstanceOf[Double], InternalRow.copyValue(i)))
      }
      buf
    }

    override def merge(buf: mutable.PriorityQueue[(Double, Any)],
                       other: mutable.PriorityQueue[(Double, Any)])
        : mutable.PriorityQueue[(Double, Any)] = {
      other.foreach(offer(buf, _))
      buf
    }

    override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any = {
      // ascending badness == best first
      val sorted = buf.toArray.sorted(worstFirst)
      new GenericArrayData(sorted.map { case (s, i) =>
        InternalRow(s, i)
      }.toArray[Any])
    }

    @transient private lazy val entryProj =
      UnsafeProjection.create(Array[DataType](DoubleType, id.dataType))

    override def serialize(buf: mutable.PriorityQueue[(Double, Any)])
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(64)
      val dos = new java.io.DataOutputStream(bos)
      dos.writeInt(buf.size)
      val row = new Array[Any](2)
      buf.foreach { case (s, i) =>
        row(0) = s; row(1) = i
        val u = entryProj(InternalRow.fromSeq(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(row)))
        dos.writeInt(u.getSizeInBytes)
        u.writeToStream(dos, null)
      }
      dos.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte])
        : mutable.PriorityQueue[(Double, Any)] = {
      val dis = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val n = dis.readInt()
      val buf = createAggregationBuffer()
      val row = new UnsafeRow(2)
      var j = 0
      while (j < n) {
        val len = dis.readInt()
        val b = new Array[Byte](len)
        dis.readFully(b)
        row.pointTo(b, len)
        // the UnsafeRow's payload points into `b`, which is fresh per
        // entry — copyValue detaches variable-length values anyway so
        // heap entries never alias a shared buffer
        buf.enqueue((row.getDouble(0),
          InternalRow.copyValue(row.get(1, id.dataType))))
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
    * `score` must cast to DoubleType; `id` is any orderable type
    * (atomic, struct, array) and rides through the heap unchanged.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    toColumn(TopKByScore(toExpression(score), toExpression(id), k)
      .toAggregateExpression())
}
