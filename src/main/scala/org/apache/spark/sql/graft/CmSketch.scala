package org.apache.spark.sql
package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min sketch (Cormode–Muthukrishnan 2005): a d×w counter matrix
 * over a string column; row i indexes by XXH64(item, seed = i+1) mod w.
 * The frequency estimate for x is min_i C[i][h_i(x)] — ALWAYS an upper
 * bound on the true count (counters only ever add), overestimating by
 * the hash collisions that land in x's cells.
 *
 * Unlike the Misra-Gries [[FreqSketch]], the sketch is DETERMINISTIC
 * under any partitioning and merge order — merge is element-wise
 * addition, a commutative monoid — so estimates replay bit-identically
 * across runs; the d×w memory bound is fixed up front rather than
 * per-item. The two are complementary: MG under-counts with a
 * guaranteed-present top set, CM over-counts with point-query support
 * for ANY item.
 *
 * Scale: partial aggregation keeps one d×w matrix per map task; the
 * reduction moves d·w longs per partition regardless of input size —
 * the classic mergeable-summaries shape.
 */
case class CmSketch(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d > 0 && d <= 16, "d must be in 1..16")
  require(w > 1, "w must be > 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"CmSketch expects a string column, got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < d) {
        buf(i * w + CmSketch.cell(s, i, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmSketch =
    copy(child = newChildren.head)
}

object CmSketch {
  /** Row i's cell for an item: XXH64 over the UTF-8 bytes with seed
    * i+1, folded to [0, w) sign-safely. Shared by the aggregate and
    * [[CmEstimate]] so a sketch built anywhere answers queries
    * anywhere. */
  def cell(s: UTF8String, row: Int, w: Int): Int = {
    val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes, row + 1L)
    (((h % w) + w) % w).toInt
  }

  /** min_i C[i][h_i(item)] — the [[CmEstimate]] kernel, also the
    * codegen target. */
  def estimate(m: ArrayData, item: UTF8String, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = m.getLong(i * w + cell(item, i, w))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** Point query against a [[CmSketch]] matrix: min over the d rows of
  * the item's cells. Null item → null; the matrix is typically a
  * 1-row broadcast (the sketch aggregate's output). */
case class CmEstimate(left: Expression, right: Expression, d: Int, w: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(d > 0 && w > 1, "bad sketch dims")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(m: Any, item: Any): Any =
    CmSketch.estimate(m.asInstanceOf[ArrayData],
      item.asInstanceOf[UTF8String], d, w)

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (m, item) =>
      s"${ev.value} = org.apache.spark.sql.graft.CmSketch.estimate(" +
        s"$m, $item, $d, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
