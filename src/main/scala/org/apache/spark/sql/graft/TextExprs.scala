package org.apache.spark.sql
package graft

import java.util.{Arrays => JArrays, LinkedHashSet}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tight-loop helpers shared by interpreted eval and generated code. The
 * shingle/fingerprint inner loops were the engine's last interpreted
 * higher-order functions on a hot path (PLANS.md measured 20-90x penalties
 * for per-element interpreted lambdas); these run one static Java call per
 * row with zero Catalyst interpretation per element.
 */
object TextOps {

  private val SPACE = UTF8String.fromString(" ")

  /** Distinct word n-grams (space-joined), first-occurrence order —
    * byte-identical to
    * `array_distinct(filter(transform(sequence(0, greatest(size(w)-n, 0)),
    *   i => when(i+n <= size(w), concat_ws(" ", slice(w, i+1, n)))), notNull))`
    * including empty-token handling (concat_ws keeps empty strings). */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    val out = new LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= len) {
      val win = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // split() never emits null elements; guard anyway (concat_ws skips)
        win(j) = if (words.isNullAt(i + j)) null else words.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(SPACE, win: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Per-set membership occurrence counts over `words` — the shared
    * kernel of [[MarkerHits]]: one scan of the array, a hash probe per
    * (word, set), no per-element Catalyst interpretation. */
  def countIn(words: ArrayData,
              sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val counts = new Array[Int](sets.length)
    val len = words.numElements()
    var i = 0
    while (i < len) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(w)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Bottom-k of distinct xxhash64(seed 42) values over every char-level
    * `gram`-window of `text` (winnowing-style document fingerprint) —
    * value-identical to
    * `slice(array_sort(array_distinct(transform(
    *    sequence(1, greatest(length(t)-gram+1, 1)),
    *    i => xxhash64(substr(t, i, gram))))), 1, k)`.
    * Windows are CHARACTER windows (like substr), hashed over their UTF-8
    * bytes without materializing any substring. */
  def bottomKNgramHashes(text: UTF8String, gram: Int, k: Int): ArrayData = {
    val nBytes = text.numBytes()
    val base = text.getBaseObject
    val off = text.getBaseOffset
    // char-start byte offsets (ASCII fast path: offsets are identities)
    val nChars = text.numChars()
    val starts = new Array[Int](nChars + 1)
    var b = 0
    var c = 0
    while (b < nBytes) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(text.getByte(b))
      c += 1
    }
    starts(nChars) = nBytes
    val nWin = math.max(nChars - gram + 1, 1)
    val hashes = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val s = starts(w)
      val e = starts(math.min(w + gram, nChars))
      hashes(w) = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      w += 1
    }
    JArrays.sort(hashes)
    // dedup in place on the sorted array, stop once k survivors exist
    val out = new Array[Long](math.min(k, nWin))
    var n = 0
    var i = 0
    while (i < nWin && n < out.length) {
      if (n == 0 || hashes(i) != out(n - 1)) { out(n) = hashes(i); n += 1 }
      i += 1
    }
    new GenericArrayData(if (n == out.length) out else JArrays.copyOf(out, n))
  }
  /** Frozen-set duplicate-span masking in one pass — value-identical to
    * the interpreted filter/transform/zip_with HOF chain in
    * `Corpus.maskSpansAgainst` (the spec-pinned twin): every `n`-token
    * window whose space-joined xxhash64 (seed 42, Spark's `xxhash64`)
    * is in `hot` marks its positions covered; surviving tokens rejoin
    * with single spaces. Returns (masked text, covered count). One
    * boolean array + one hash probe per window; no per-element Catalyst
    * interpretation — the streaming scrub's hot path. */
  def maskSpans(words: ArrayData, hot: java.util.HashSet[java.lang.Long],
                n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val len = words.numElements()
    val covered = new Array[Boolean](len)
    var nMasked = 0
    // empty hot set: nothing can match — skip all hashing (the no-op
    // pass-through case must actually be free)
    if (!hot.isEmpty) {
      var i = 0
      while (i + n <= len) {
        val win = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          win(j) = if (words.isNullAt(i + j)) null
                   else words.getUTF8String(i + j)
          j += 1
        }
        val s = UTF8String.concatWs(SPACE, win: _*)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        if (hot.contains(h)) {
          var k = i
          while (k < i + n) {
            if (!covered(k)) { covered(k) = true; nMasked += 1 }
            k += 1
          }
        }
        i += 1
      }
    }
    val keep = new Array[UTF8String](len - nMasked)
    var i = 0
    var o = 0
    while (i < len) {
      if (!covered(i)) {
        keep(o) = if (words.isNullAt(i)) null else words.getUTF8String(i)
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.concatWs(SPACE, keep: _*), nMasked))
  }

  /** Distinct char n-grams of every length in [minN, maxN] (full windows
    * only), optionally followed by the original string — value-identical
    * to the per-length transform/sequence/substr HOF chain
    * (n-ascending, position-ascending, first-occurrence dedup). */
  def charNgrams(text: UTF8String, minN: Int, maxN: Int,
                 preserveOriginal: Boolean): ArrayData = {
    val len = text.numChars()
    val out = new LinkedHashSet[UTF8String]()
    var n = minN
    while (n <= maxN) {
      var i = 0
      while (i + n <= len) {
        out.add(text.substring(i, i + n))
        i += 1
      }
      n += 1
    }
    if (preserveOriginal) out.add(text)
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Distinct edge n-grams (prefixes of length minN..maxN) of each word
    * plus the full word, word order preserved — value-identical to the
    * flatten/transform/sequence/substr HOF chain. */
  def edgePrefixes(words: ArrayData, minN: Int, maxN: Int): ArrayData = {
    val out = new LinkedHashSet[UTF8String]()
    var i = 0
    while (i < words.numElements()) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val len = w.numChars()
        var n = minN
        while (n <= maxN && n <= len) {
          out.add(w.substring(0, n))
          n += 1
        }
        out.add(w)
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Jaro–Winkler similarity kernel over the UTF-8 bytes (see the
    * [[JaroWinkler]] scaladoc for the DuckDB-equivalence contract).
    * IEEE order is load-bearing: (m/la + m/lb + (m−t)/m)/3, then
    * sim + p·0.1·(1−sim) with left-associative products. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.getBytes; val sb = b.getBytes
    val la = sa.length; val lb = sb.length
    if (la == 0 || lb == 0) return 0.0
    val bound = math.max(math.max(la, lb) / 2 - 1, 0)
    val matchedA = new Array[Boolean](la)
    val matchedB = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + bound)
      var j = math.max(0, i - bound)
      var found = false
      while (j <= hi && !found) {
        if (!matchedB(j) && sa(i) == sb(j)) {
          matchedA(i) = true; matchedB(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (matchedA(i)) {
        while (!matchedB(j)) j += 1
        if (sa(i) != sb(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2 // integer halving — the DuckDB/rapidfuzz convention (probed)
    var sim = (m.toDouble / la + m.toDouble / lb +
      (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && sa(p) == sb(p)) p += 1
      sim = sim + p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Distinct word n-gram shingles of a token array, one generated call per
  * row. Replaces the interpreted transform/slice/concat_ws pipeline that
  * dominated every MinHash-family query (~2.3 s of q37's 5 s at sf0.1). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "shingle size must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextOps.shingles(a.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.shingles($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Distinct char n-grams (N1 analyzer) in one generated call per row. */
case class CharNgrams(child: Expression, minN: Int, maxN: Int,
                      preserveOriginal: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(0 < minN && minN <= maxN, "need 0 < minN <= maxN")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextOps.charNgrams(a.asInstanceOf[UTF8String], minN, maxN, preserveOriginal)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.charNgrams($a, $minN, $maxN, $preserveOriginal);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Distinct per-word edge n-grams (N2 analyzer tail) in one generated
  * call per row over the tokenized words array. */
case class EdgeNgrams(child: Expression, minN: Int, maxN: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(0 < minN && minN <= maxN, "need 0 < minN <= maxN")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextOps.edgePrefixes(a.asInstanceOf[ArrayData], minN, maxN)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.edgePrefixes($a, $minN, $maxN);")

  override protected def withNewChildInternal(newChild: Expression): EdgeNgrams =
    copy(child = newChild)
}

/** Bottom-k distinct rolling char n-gram hash fingerprint, one generated
  * call per row (the md5 column variant remains for the SQL oracle gate). */
case class NgramFingerprint(child: Expression, gram: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(gram > 0 && k > 0, "gram and k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TextOps.bottomKNgramHashes(a.asInstanceOf[UTF8String], gram, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.bottomKNgramHashes($a, $gram, $k);")

  override protected def withNewChildInternal(newChild: Expression): NgramFingerprint =
    copy(child = newChild)
}

/** Frozen-set duplicate-span masking (struct<text, n_masked>), one
  * generated call per row — the codegen'd face of the streaming span
  * scrub (the interpreted HOF chain stays as the spec-pinned twin). */
case class MaskSpans(child: Expression, hotHashes: Seq[Long], n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, "span length must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  @transient private lazy val hot: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    hotHashes.foreach(h => s.add(h))
    s
  }

  override def nullSafeEval(a: Any): Any =
    TextOps.maskSpans(a.asInstanceOf[ArrayData], hot, n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hotRef = ctx.addReferenceObj("hotSpans", hot, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.maskSpans($a, $hotRef, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): MaskSpans =
    copy(child = newChild)
}

/** Occurrence counts of each marker word-set among `words` in ONE pass —
  * replaces a per-language interpreted `size(filter(words, isin(...)))`
  * HOF (one lambda eval per word per language). Counts come back in
  * marker-set order as array<int>. */
case class MarkerHits(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  require(markers.nonEmpty, "need at least one marker set")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markers.map { ms =>
      val s = new java.util.HashSet[UTF8String]()
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }.toArray

  override def nullSafeEval(a: Any): Any =
    TextOps.countIn(a.asInstanceOf[ArrayData], sets)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.countIn($a, $setsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerHits =
    copy(child = newChild)
}

/** Jaro–Winkler string similarity (record-linkage staple) as one static
  * kernel call per row — the same match-window / integer-halved-
  * transposition / prefix-boost algorithm DuckDB ships (rapidfuzz
  * lineage), with IEEE operations in the identical order, so the gate
  * compares bit-for-bit against `jaro_winkler_similarity` (probed
  * semantics, PLANS round 8: both-empty → 0, window 0 = same-position
  * only, transpositions halve as INTEGERS — 'abcdef'/'bcadef' = 17/18 —
  * boost only when sim > 0.7, prefix capped at 4). Byte-level
  * comparison: identical to DuckDB's codepoint walk on ASCII inputs;
  * multi-byte text would count bytes where DuckDB counts codepoints. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    TextOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graft.TextOps.jaroWinkler($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
