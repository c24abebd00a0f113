package org.apache.spark.sql
package graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries heavy-hitter sketch: a bounded-memory (≤ k counters)
 * mergeable frequency summary over a string column.
 *
 * The exact alternative — `groupBy(token).count()` over a vocabulary —
 * shuffles one row per distinct token; at 100 TB the interesting output
 * is the top handful of heavy hitters, and this aggregate gets them with
 * k counters PER MAP TASK: partial aggregation keeps each partition's
 * sketch at k entries, merges are the standard mergeable-summaries
 * reduction (sum counts, subtract the (k+1)-th largest, drop non-positive
 * — Agarwal et al., "Mergeable Summaries", PODS 2012), and the final
 * sketch is k (item, estimate) pairs.
 *
 * Guarantees (classic MG, preserved under merge): every estimate is a
 * LOWER bound on the true count, undercounting by at most n/(k+1) over n
 * total rows — so any item with true frequency > n/(k+1) is guaranteed
 * present. Estimates are NOT deterministic across partitionings (merge
 * order shifts them within the error bound), which is why this is
 * spec-verified by its guarantees rather than oracle-gated.
 */
case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"FreqSketch expects a string column, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    new mutable.HashMap[UTF8String, Long]()

  /** The Misra-Gries step: known item +1; room for a new counter; or
    * decrement everything (amortized O(1) — each decrement pays for an
    * earlier arrival). */
  private def offer(buf: mutable.HashMap[UTF8String, Long],
                    item: UTF8String): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1L)
      case None if buf.size < k => buf.update(item.clone(), 1L)
      case None =>
        // snapshot the keys: structural mutation during keysIterator is
        // undefined for mutable.HashMap
        val keys = buf.keys.toArray
        keys.foreach { key =>
          val c = buf(key) - 1L
          if (c <= 0) buf.remove(key) else buf.update(key, c)
        }
    }
  }

  /** Mergeable-summaries reduction: if more than k counters survive a
    * merge, subtract the (k+1)-th largest count from all and drop the
    * non-positive — error bounds add, keeping the n/(k+1) guarantee. */
  private def reduceToK(buf: mutable.HashMap[UTF8String, Long]): Unit = {
    if (buf.size > k) {
      val counts = buf.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      val keys = buf.keys.toArray
      keys.foreach { key =>
        val c = buf(key) - cut
        if (c <= 0) buf.remove(key) else buf.update(key, c)
      }
    }
  }

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
                     b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    reduceToK(b1)
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c).asInstanceOf[Any]
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val payload = entries.map { case (item, _) => item.getBytes }
    val size = 4 + payload.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}
