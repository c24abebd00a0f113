package org.apache.spark.sql
package graft

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable KLL-lite state: `levels(i)` holds items of weight `2^i`;
  * `coins(i)` alternates the kept parity per compaction (halves the
  * realized error vs a fixed parity while staying deterministic per
  * buffer); `err` is the CERTIFIED worst-case rank error accumulated so
  * far (each compaction at weight w adds exactly w). */
final class KllBuffer {
  var n: Long = 0L
  var err: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer.empty
  val coins: ArrayBuffer[Boolean] = ArrayBuffer.empty
}

/**
 * KLL-lite mergeable quantile sketch over a double column — the
 * approximate twin of `Corpus.discPercentiles` for 100 TB distributions
 * where even a deterministic bottom-k sample is too coarse.
 *
 * Multi-level compaction (Karnin-Lang-Liberty simplified to a fixed
 * per-level capacity `k`): level i stores items of weight 2^i; when a
 * level fills, its sorted items are paired and one of each pair survives
 * to level i+1 at doubled weight (alternating parity). Partial
 * aggregation keeps every map task's state at O(k·log(n/k)) items, and
 * merge is buffer concatenation + re-compaction — the standard mergeable
 * summary shape (Agarwal et al., "Mergeable Summaries", PODS 2012;
 * Karnin/Lang/Liberty, "Optimal Quantile Approximation in Streams",
 * FOCS 2016).
 *
 * Guarantee — SELF-CERTIFIED: each pair-compaction at weight w displaces
 * any rank by at most w, so the output's `err_bound` (the sum of those
 * w's along every surviving item's history, tracked exactly) bounds the
 * rank error of ANY quantile read off the summary:
 * |true_rank(estimate) − target_rank| ≤ err_bound, with
 * err_bound ≲ 2·n·log2(n/k)/k. Like FreqSketch, estimates shift within
 * the bound across merge orders (spec-verified by its guarantees at
 * multiple partitionings rather than oracle-gated; the bound ITSELF is
 * what the q77-family gate checks).
 *
 * Output: struct(n, err_bound, items array<struct<v double, w bigint>>)
 * with items sorted by value and Σw = n (mass conservation, spec-pinned).
 * Read quantiles with `VectorExpressions.kllQuantile`.
 */
case class KllSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, "compactor capacity k must be >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("err_bound", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType), StructField("w", LongType)))))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"KllSketch expects a double column, got $other")
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer

  private def ensureLevel(buf: KllBuffer, i: Int): Unit =
    while (buf.levels.size <= i) {
      buf.levels += ArrayBuffer.empty[Double]
      buf.coins += false
    }

  /** Compact level i: sort, keep one item per adjacent pair (parity
    * alternates per compaction), promote survivors to weight 2^(i+1); an
    * odd leftover (the max) stays at level i exactly. Certified error:
    * each displaced pair contributes ≤ 2^i, and a single compaction
    * displaces any given rank at most once → err += 2^i. */
  private def compact(buf: KllBuffer, i: Int): Unit = {
    val cur = buf.levels(i)
    if (cur.size < 2) return
    ensureLevel(buf, i + 1)
    val sorted = cur.toArray
    java.util.Arrays.sort(sorted)
    val pairs = sorted.length / 2
    val offset = if (buf.coins(i)) 1 else 0
    buf.coins(i) = !buf.coins(i)
    val next = buf.levels(i + 1)
    var p = 0
    while (p < pairs) {
      next += sorted(2 * p + offset)
      p += 1
    }
    cur.clear()
    if (sorted.length % 2 == 1) cur += sorted(sorted.length - 1)
    buf.err += (1L << i)
  }

  private def cascade(buf: KllBuffer): Unit = {
    var i = 0
    while (i < buf.levels.size) {
      while (buf.levels(i).size >= k) compact(buf, i)
      i += 1
    }
  }

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      ensureLevel(buf, 0)
      buf.levels(0) += v.asInstanceOf[Double]
      buf.n += 1L
      if (buf.levels(0).size >= k) cascade(buf)
    }
    buf
  }

  override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = {
    b1.n += b2.n
    b1.err += b2.err
    var i = 0
    while (i < b2.levels.size) {
      ensureLevel(b1, i)
      b1.levels(i) ++= b2.levels(i)
      i += 1
    }
    cascade(b1)
    b1
  }

  override def eval(buf: KllBuffer): Any = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < buf.levels.size) {
      val w = 1L << i
      buf.levels(i).foreach(v => items += ((v, w)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    InternalRow(buf.n, buf.err,
      new GenericArrayData(sorted.map { case (v, w) =>
        InternalRow(v, w).asInstanceOf[Any]
      }.toArray))
  }

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val size = 8 + 8 + 4 + buf.levels.map(l => 4 + 1 + l.size * 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n)
    bb.putLong(buf.err)
    bb.putInt(buf.levels.size)
    buf.levels.zip(buf.coins).foreach { case (l, c) =>
      bb.putInt(l.size)
      bb.put(if (c) 1.toByte else 0.toByte)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer
    buf.n = bb.getLong
    buf.err = bb.getLong
    val nLevels = bb.getInt
    var i = 0
    while (i < nLevels) {
      val sz = bb.getInt
      val coin = bb.get() == 1.toByte
      val l = ArrayBuffer.empty[Double]
      var j = 0
      while (j < sz) { l += bb.getDouble; j += 1 }
      buf.levels += l
      buf.coins += coin
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketch =
    copy(child = newChildren.head)
}
