package org.apache.spark.sql
package graft

import _root_.graft.functions.GraftHash
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xv = (double) $a.$lGet($i);
        |  double $yv = (double) $b.$rGet($i);
        |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two float/double array columns → double.
  * Same widen-to-double, left-to-right accumulation contract as
  * [[CosineSim]], so a SQL oracle's list_sum of squared CASTed
  * differences matches bit-for-bit. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
        |  $acc += $d * $d;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

/** Fused PQ codeword assignment: one pass over the vector emits all m
  * subspace codes (argmin squared-L2 codeword per subspace, ties to the
  * lower index). Arithmetic contract matches chaining [[L2Sq]] probes
  * (widen to double, accumulate left-to-right, strict-less argmin), so
  * swapping this kernel in changes no gated value — it removes the
  * m×k struct array + array_min allocation churn per row.
  *
  * @param codebooks flattened row-major: codeword (s, j) occupies
  *        [(s·k + j)·dsub, +dsub) */
case class PqAssign(child: Expression, codebooks: Array[Double],
                    m: Int, k: Int, dsub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.length == m * k * dsub, "codebooks shape mismatch")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        var d = 0.0
        var t = 0
        val base = (s * k + j) * dsub
        while (t < dsub) {
          val x = if (isF) v.getFloat(s * dsub + t).toDouble
                  else v.getDouble(s * dsub + t)
          val diff = x - codebooks(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val d = ctx.freshName("d"); val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best"); val base = ctx.freshName("base")
      val diff = ctx.freshName("diff")
      s"""
        |int[] $codes = new int[$m];
        |for (int $s = 0; $s < $m; $s++) {
        |  int $best = 0; double $bestD = Double.POSITIVE_INFINITY;
        |  for (int $j = 0; $j < $k; $j++) {
        |    double $d = 0.0;
        |    int $base = ($s * $k + $j) * $dsub;
        |    for (int $t = 0; $t < $dsub; $t++) {
        |      double $diff = (double) $v.$get($s * $dsub + $t) - $cb[$base + $t];
        |      $d += $diff * $diff;
        |    }
        |    if ($d < $bestD) { $bestD = $d; $best = $j; }
        |  }
        |  $codes[$s] = $best;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

case class HyperplaneSig(child: Expression, nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes > 0 && nPlanes <= 63, "nPlanes in 1..63")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val v = if (elemIsFloat) x.getFloat(d).toDouble else x.getDouble(d)
        val sign = if ((GraftHash.mix(p * GraftHash.GOLDEN + d) & 1L) == 1L) 1.0 else -1.0
        dot += sign * v
        d += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig"); val v = ctx.freshName("v")
      s"""
        |int $n = $a.numElements();
        |long $sig = 0L;
        |for (int $p = 0; $p < $nPlanes; $p++) {
        |  double $dot = 0.0;
        |  for (int $d = 0; $d < $n; $d++) {
        |    double $v = (double) $a.$get($d);
        |    if ((graft.functions.GraftHash.mix($p * graft.functions.GraftHash.GOLDEN() + $d) & 1L) == 1L) $dot += $v; else $dot -= $v;
        |  }
        |  if ($dot > 0) $sig |= (1L << $p);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in one codegen'd pass: each token's
  * xxhash64 votes ±1 per bit; the sign of each bit's tally sets the
  * fingerprint bit. Replaces an explode + 64-column aggregate (one shuffle
  * and 64 agg states per doc) with a narrow per-row loop — identical
  * output values because Spark's xxhash64(col) is XXH64 with seed 42. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val counts = new Array[Long](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val counts = ctx.freshName("counts"); val h = ctx.freshName("h")
      val t = ctx.freshName("t"); val sig = ctx.freshName("sig")
      s"""
        |long[] $counts = new long[64];
        |for (int $i = 0; $i < $a.numElements(); $i++) {
        |  if (!$a.isNullAt($i)) {
        |    org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($i);
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |      $t.getBaseObject(), $t.getBaseOffset(), $t.numBytes(), 42L);
        |    for (int $b = 0; $b < 64; $b++) {
        |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
        |    }
        |  }
        |}
        |long $sig = 0L;
        |for (int $b = 0; $b < 64; $b++) if ($counts[$b] > 0) $sig |= (1L << $b);
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
