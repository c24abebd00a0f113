package org.apache.spark.sql
package graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded-heap top-k aggregate over (score double, id long) pairs.
 *
 * The window formulation (`row_number().over(Window.partitionBy(query)
 * .orderBy(score.desc))`) shuffles EVERY scored row to |queries|
 * partitions — with 10 queries, 10 tasks process the whole corpus's
 * scores. This aggregate participates in partial aggregation: each map
 * task keeps at most k pairs per query (a k-bounded min-heap), so the
 * shuffle carries k rows per query per partition instead of the full
 * scored set, and parallelism stays with the corpus scan.
 *
 * Ordering contract matches the window version exactly: best = highest
 * score, ties broken by the LOWER id. Output: array<struct<cos, id>>
 * sorted best-first, ready for posexplode → rank.
 */
case class BoundedTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // max element under this ordering = WORST pair (lowest score, ties to
  // the higher id) — so dequeue() evicts the worst
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (c, i) => (-c, i) }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cos", DoubleType), StructField("id", LongType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BoundedTopK expects struct<double,long>, got $other")
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) { // better than worst
      buf.dequeue(); buf.enqueue(cand)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(buf, (row.getDouble(0), row.getLong(1)))
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (c, i) => (-c, i) } // best first
    new GenericArrayData(sorted.map { case (c, i) =>
      InternalRow(c, i).asInstanceOf[Any]
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (c, i) => bb.putDouble(c); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}
