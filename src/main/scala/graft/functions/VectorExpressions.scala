package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector-similarity hot path.
 *
 * Spark's higher-order functions (`transform`/`zip_with`/`aggregate`) are
 * evaluated INTERPRETED — fine for occasional use, but a cosine similarity
 * over every (query, corpus) pair is the innermost loop of similarity
 * search. These expressions generate a tight Java loop (doGenCode), keeping
 * the whole stage inside WholeStageCodegen: measured ~20× faster than the
 * HOF formulation at sf0.01.
 *
 * Accumulation order is a plain left-to-right fold per accumulator, which
 * is exactly what DuckDB's list_sum over a list computes — so results stay
 * bit-identical to the SQL oracle.
 */
object VectorExpressions {

  /** Cosine similarity of two float/double array columns → double. */
  def vecCosine(a: Column, b: Column): Column =
    ColumnShim.column(org.apache.spark.sql.graft.CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Squared L2 distance of two float/double array columns → double
    * (the PQ codeword-assignment metric). */
  def vecL2Sq(a: Column, b: Column): Column =
    ColumnShim.column(org.apache.spark.sql.graft.L2Sq(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Fused PQ codeword assignment: all m subspace codes in one codegen'd
    * pass (value-identical to m·k chained [[vecL2Sq]] probes + argmin). */
  def pqAssign(vec: Column, codebooks: Array[Double],
               m: Int, k: Int, dsub: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.PqAssign(
      ColumnShim.expression(vec), codebooks, m, k, dsub))

  /** Random-hyperplane LSH signature (nPlanes bits packed in a long).
    * Deterministic: plane p's coefficient for dimension d is the ±1 sign
    * of splitmix64(p * GOLDEN + d). */
  def hyperplaneSig(vec: Column, nPlanes: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.HyperplaneSig(ColumnShim.expression(vec), nPlanes))

  /** 64-bit SimHash of a token array — one codegen'd pass per row;
    * bit-identical to the explode + 64-column-aggregate formulation. */
  def simHash64(tokens: Column): Column =
    ColumnShim.column(org.apache.spark.sql.graft.SimHash64(ColumnShim.expression(tokens)))

  /** Distinct word n-gram shingles (space-joined) of a token array —
    * one codegen'd call per row, byte-identical to the interpreted
    * transform/slice/concat_ws/array_distinct formulation. */
  def wordShingles(words: Column, n: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.WordShingles(ColumnShim.expression(words), n))

  /** Bottom-k distinct xxhash64 over rolling char n-gram windows — the
    * codegen'd document fingerprint (value-identical to the HOF
    * sequence/substr/xxhash64 + distinct/sort/slice form). */
  def ngramFingerprint(text: Column, gram: Int, k: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.NgramFingerprint(ColumnShim.expression(text), gram, k))

  /** Occurrence counts of every marker word-set in ONE codegen'd pass
    * over the token array (counts in marker-set order). */
  def markerHits(words: Column, markers: Seq[Seq[String]]): Column =
    ColumnShim.column(org.apache.spark.sql.graft.MarkerHits(ColumnShim.expression(words), markers))

  /** Frozen-set duplicate-span masking over a token array in ONE
    * codegen'd pass — struct<text, n_masked>; value-identical to the
    * interpreted HOF chain (spec-pinned). */
  def maskSpans(words: Column, hotHashes: Seq[Long], n: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.MaskSpans(
      ColumnShim.expression(words), hotHashes, n))

  /** Jaro–Winkler similarity of two string columns → double, one
    * codegen'd kernel call per row, bit-identical to DuckDB's
    * `jaro_winkler_similarity` on ASCII inputs (probed semantics —
    * see the Expression scaladoc). */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(org.apache.spark.sql.graft.JaroWinkler(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Misra-Gries heavy-hitter sketch aggregate: ≤ k mergeable counters,
    * every estimate a lower bound undercounting by ≤ n/(k+1) — any item
    * above that frequency is guaranteed in the result. */
  def freqSketch(item: Column, k: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft
      .FreqSketch(ColumnShim.expression(item), k)
      .toAggregateExpression())

  /** Count-Min sketch aggregate: a d×w counter matrix (array<long>),
    * merge = element-wise add, so — unlike [[freqSketch]] — estimates
    * are DETERMINISTIC under any partitioning. Query with
    * [[cmEstimate]]; every estimate is an upper bound on the true
    * count. */
  def cmSketch(item: Column, d: Int, w: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft
      .CmSketch(ColumnShim.expression(item), d, w)
      .toAggregateExpression())

  /** Point query against a [[cmSketch]] matrix: min over the d rows of
    * the item's cells — ≥ the item's true count, always. */
  def cmEstimate(matrix: Column, item: Column, d: Int, w: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft.CmEstimate(
      ColumnShim.expression(matrix), ColumnShim.expression(item), d, w))

  /** KLL-lite mergeable quantile sketch aggregate over a double column:
    * O(k·log(n/k)) state per map task, self-certified rank-error bound
    * (output struct(n, err_bound, items)); read values off it with
    * [[kllQuantile]]. */
  def kllSketch(value: Column, k: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft
      .KllSketch(ColumnShim.expression(value), k)
      .toAggregateExpression())

  /** Rank-pick quantile from a [[kllSketch]] summary: the first item (by
    * value order) whose cumulative weight reaches ceil(p·n) — the same
    * interpolation-free rule as `Corpus.discPercentiles`, with rank
    * error ≤ the summary's own err_bound. Null on an empty sketch. */
  def kllQuantile(sketch: Column, p: Double): Column = {
    import org.apache.spark.sql.functions._
    require(p > 0 && p <= 1, "quantile must be in (0, 1]")
    val target = ceil(lit(p) * sketch.getField("n")).cast("long")
    val folded = aggregate(
      sketch.getField("items"),
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, x) => {
        val cum = acc.getField("cum") + x.getField("w")
        when(acc.getField("ans").isNotNull, acc)
          .otherwise(struct(cum.as("cum"),
            when(cum >= target, x.getField("v"))
              .otherwise(lit(null).cast("double")).as("ans")))
      })
    folded.getField("ans")
  }

  /** Bounded-heap top-k aggregate over struct<cos double, id long> —
    * partial aggregation keeps at most k pairs per group per map task,
    * so a top-k never shuffles the full scored set (the window
    * formulation does). Best-first array out; ties to the lower id. */
  def topKPairs(pair: Column, k: Int): Column =
    ColumnShim.column(org.apache.spark.sql.graft
      .BoundedTopK(ColumnShim.expression(pair), k).toAggregateExpression())
}

/** splitmix64 — shared by interpreted eval and generated code. */
object GraftHash {
  final val GOLDEN = 0x9E3779B97F4A7C15L
  def mix(zIn: Long): Long = {
    var z = zIn + GOLDEN
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
