package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * - `bruteForceTopK`: exact cosine top-k — the correctness baseline. The
 *   pair join is a broadcast of the (small) query set against the corpus;
 *   dot products run inside codegen via `zip_with`/`aggregate` higher-order
 *   functions, no UDF.
 * - `lshTopK`: the scale path — random-hyperplane LSH buckets shrink the
 *   candidate set from |corpus| to a bucket, turning the similarity scan
 *   into an equi-join on (bucket). Hyperplanes are derived deterministically
 *   from xxhash64(plane, dim) so executors need no shared RNG state.
 *
 * At 100 TB the brute-force path is only for small query batches
 * (broadcast); LSH (or an IVF coarse quantizer built with k-means — same
 * bucket-join shape) is the default.
 */
object Similarity {

  /** Cosine similarity between two array<float>/array<double> columns.
    * A custom codegen'd Catalyst expression (VectorExpressions.CosineSim):
    * Spark's higher-order functions run interpreted, which made this the
    * bottleneck of the whole similarity path. Element values are widened
    * to double before multiplying and accumulated left-to-right, matching
    * a SQL oracle's list_sum-with-casts bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecCosine(a, b)

  /**
   * Exact cosine top-k neighbors for each query vector.
   * @param corpus   (id, vec) — the full embedding table
   * @param queries  (id, vec) — small; broadcast against the corpus
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    topK(scored, k)
  }

  /** Per-query top-k via the bounded-heap aggregate (BoundedTopK): map
    * tasks truncate to k pairs per query BEFORE the shuffle, so the
    * exchange carries k·|queries| rows per partition instead of every
    * scored row (the round-1 window formulation funneled the whole scored
    * set into |queries| tasks). Tie-break identical to the window version:
    * cos desc, then the lower id. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(graft.functions.VectorExpressions.topKPairs(
        struct(col("cos").cast("double").as("cos"),
          col("nbr_id").cast("long").as("id")), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("r0", "t")))
      .select(col("query_id"), col("t.id").as("nbr_id"), col("t.cos").as("cos"),
        (col("r0") + 1).cast("int").as("rank"))

  // -------------------------------------------------------------------
  // Scalar quantization (SQ8) — ANN over a compressed corpus
  // -------------------------------------------------------------------

  /** Per-dimension corpus [min, max] in ONE partial-agg pass: 2·dim
    * counters map-side, a single 2·dim-value row to the driver — the
    * corpus is never exploded or shuffled to learn its ranges. */
  def sqStats(corpus: DataFrame, dim: Int,
              vecCol: String = "embedding"): (Seq[Double], Seq[Double]) = {
    val aggs = (0 until dim).flatMap { i =>
      Seq(min(element_at(col(vecCol), i + 1).cast("double")).as(s"mn$i"),
        max(element_at(col(vecCol), i + 1).cast("double")).as(s"mx$i"))
    }
    val r = corpus.agg(aggs.head, aggs.drop(1): _*).head()
    require(!r.isNullAt(0),
      s"sqStats: corpus has no non-null '$vecCol' vectors — nothing to " +
        "learn quantization ranges from")
    ((0 until dim).map(i => r.getDouble(2 * i)),
      (0 until dim).map(i => r.getDouble(2 * i + 1)))
  }

  /** SQ8 encode: per-dimension affine map onto 0..255 (FAISS SQ8 / int8
    * range quantization) — a float corpus shrinks 4× (constant-range
    * dims collapse to code 0). Narrow: the 2·dim stats ride the plan as
    * array literals; `round` is exactly DuckDB's away-from-zero on the
    * non-negative argument, so the gate reproduces codes bit-for-bit. */
  def sqEncode(vec: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mn = typedLit(mins)
    val scale = typedLit(mins.indices.map(i => (maxs(i) - mins(i)) / 255.0))
    transform(vec, (x, i) =>
      when(element_at(scale, i + 1) === 0d, 0)
        .otherwise(round((x.cast("double") - element_at(mn, i + 1)) /
          element_at(scale, i + 1)).cast("int")))
  }

  /** SQ8 decode back to array<double>: mn + code·scale — each element
    * lands within scale/2 of the original. */
  def sqDecode(codes: Column, mins: Seq[Double], maxs: Seq[Double]): Column = {
    val mn = typedLit(mins)
    val scale = typedLit(mins.indices.map(i => (maxs(i) - mins(i)) / 255.0))
    transform(codes, (c, i) =>
      element_at(mn, i + 1) + c.cast("double") * element_at(scale, i + 1))
  }

  /** Asymmetric SQ8 top-k: the corpus is held as int8-range CODES (the
    * compressed index — at 100 TB this is the 4× memory/scan lever and
    * the shape FAISS calls SQ with asymmetric distance: full-precision
    * queries, quantized corpus). Codes decode in the scoring map
    * (narrow), exact cosine against the broadcast queries, BoundedTopK
    * truncates per map task. Recall loss is the quantization error
    * only; SimilaritySpec pins top-1 agreement with [[bruteForceTopK]]
    * on separated clusters and gate q87 pins the whole pipeline
    * (stats → codes → decode → score) cell-exact vs DuckDB. */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mins, maxs) = sqStats(corpus, dim, vecCol)
    val codes = corpus.select(col(idCol).as("nbr_id"),
      sqEncode(col(vecCol), mins, maxs).as("codes"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos",
        cosine(col("q_vec"), sqDecode(col("codes"), mins, maxs)))
    topK(scored, k)
  }

  // -------------------------------------------------------------------
  // Product quantization (PQ) — 32× compressed ANN codes
  // -------------------------------------------------------------------

  /** PQ codebooks: for each of m subspaces, k codewords of dim/m
    * doubles (FAISS IVF-PQ's fine quantizer). A 64-dim float vector
    * (256 B) becomes m=8 byte codes — 32× compression. */
  type PqCodebooks = Seq[Seq[Seq[Double]]]

  /** Deterministic codebooks — subspace s's codewords are the first k
    * corpus rows' s-th subvectors (ordered by id). This is the
    * oracle-checkable choice (gate q88 reproduces it in SQL verbatim);
    * production training uses [[pqTrain]], whose k-means codebooks
    * change the CODES but not one line of the encode/decode/score
    * machinery the gate pins. */
  def pqCodebooksFromRows(corpus: DataFrame, dim: Int, m: Int, k: Int,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): PqCodebooks = {
    val dsub = dim / m
    val rows = corpus.orderBy(idCol).limit(k)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    (0 until m).map(s => rows.map(_.slice(s * dsub, (s + 1) * dsub)).toSeq)
  }

  /** Production PQ trainer: seeded k-means per subspace (MLlib, train
    * time only — query paths never touch ml.linalg). */
  def pqTrain(corpus: DataFrame, dim: Int, m: Int, k: Int,
              vecCol: String = "embedding"): PqCodebooks = {
    val dsub = dim / m
    val toVec = org.apache.spark.sql.functions.udf {
      (a: scala.collection.Seq[Float]) =>
        org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray)
    }
    (0 until m).map { s =>
      val sub = corpus.select(
        toVec(slice(col(vecCol), s * dsub + 1, dsub)).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(7L + s).setMaxIter(10).fit(sub)
        .clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  /** PQ encode: per subspace, the index of the L2-nearest codeword
    * (ties to the lower index) — ONE fused codegen'd kernel pass
    * (PqAssign) over the vector with the codebooks as a referenced
    * constant; value-identical to the compositional m×k L2Sq +
    * array_min formulation (spec-pinned), without its per-row struct
    * array allocation churn. Narrow: no join, no shuffle between the
    * vector scan and its codes. */
  def pqEncode(vec: Column, cb: PqCodebooks): Column = {
    val m = cb.size
    val k = cb.head.size
    val dsub = cb.head.head.size
    val flat = cb.flatten.flatten.toArray
    graft.functions.VectorExpressions.pqAssign(vec, flat, m, k, dsub)
  }

  /** The compositional encode (m×k codegen'd L2Sq probes + struct
    * argmin) — the witness the fused kernel is spec-pinned against. */
  private[graft] def pqEncodeCompositional(vec: Column, cb: PqCodebooks): Column = {
    val m = cb.size
    val dsub = cb.head.head.size
    val codes = (0 until m).map { s =>
      val sub = slice(vec, s * dsub + 1, dsub)
      val cands = cb(s).indices.map { j =>
        struct(
          graft.functions.VectorExpressions
            .vecL2Sq(sub, typedLit(cb(s)(j))).as("d"),
          lit(j).as("i"))
      }
      array_min(array(cands: _*)).getField("i")
    }
    array(codes: _*)
  }

  /** PQ decode: concatenated chosen codewords → array<double> (the
    * reconstruction ADC scores against). */
  def pqDecode(codes: Column, cb: PqCodebooks): Column = {
    val m = cb.size
    val parts = (0 until m).map { s =>
      element_at(typedLit(cb(s)), element_at(codes, s + 1) + 1)
    }
    concat(parts: _*)
  }

  /** Asymmetric PQ top-k: the corpus is held as m small codes (32×
    * compression at dim 64 / m 8), full-precision queries score the
    * reconstructions — decode is a narrow literal lookup, cosine is the
    * codegen'd kernel, BoundedTopK truncates map-side. Equivalent to
    * classic table-lookup ADC (the table entries ARE codeword dot
    * products; summing them equals scoring the concatenated
    * reconstruction), expressed reconstruction-first so the SQL oracle
    * can replay it cell-exact. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             cb: PqCodebooks,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // decode ONCE per corpus row, BEFORE the query join — decoding
    // inside the join would re-reconstruct the same vector per (row ×
    // query) pair, |queries|× wasted work at any scale
    val deq = corpus.select(col(idCol).as("nbr_id"),
      pqDecode(pqEncode(col(vecCol), cb), cb).as("nbr_deq"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = deq.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_deq")))
    topK(scored, k)
  }

  /** Random-hyperplane signature: bit i = sign(vec · plane_i), planes
    * derived deterministically from splitmix64(plane, dim) → ±1. A custom
    * codegen'd expression (VectorExpressions.HyperplaneSig) — executors
    * need no shared RNG state and the loop stays in WholeStageCodegen.
    * `nPlanes = 0` degenerates to a single all-pass bucket — every pair
    * becomes a candidate, which makes the LSH pipeline exhaustive (used by
    * the oracle-checked gate variant; never at scale). */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column =
    if (nPlanes == 0) lit(0L)
    else graft.functions.VectorExpressions.hyperplaneSig(vec, nPlanes)

  /** Deterministic coarse centroids for oracle-replayable gates: the
    * `nCells` lowest-id corpus vectors, verbatim (the coarse-quantizer
    * analogue of [[pqCodebooksFromRows]]). Production trains k-means
    * ([[trainCentroids]]); this face exists so an external engine can
    * reproduce the cell assignment cell-exactly. */
  def centroidsFromRows(corpus: DataFrame, nCells: Int,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): Seq[(Int, Array[Float])] =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol)).collect()
      .zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[Float](0).toArray)
      }.toSeq

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication of an embedded corpus — assign every vector to its
    * nearest coarse centroid, find within-cell pairs with cosine ≥
    * `threshold`, collapse each connected component to its minimum-id
    * survivor (the [[Dedup]] convention), and anti-join the losers out.
    * Returns the surviving corpus rows unchanged.
    *
    * Shape at 100 TB: the cell assignment is NARROW ([[assignCells]] —
    * no join, no shuffle); candidate pairs come from a per-cell
    * equi-self-join (never all-pairs — the clustering exists precisely
    * to bound the quadratic term to cell sizes); components run on the
    * pair graph (node-sized, not corpus-sized); the final anti-join
    * moves only loser ids. The corpus embedding payload shuffles once,
    * into its cells. */
  def semanticDedup(corpus: DataFrame, centroids: Seq[(Int, Array[Float])],
                    threshold: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxCellSize: Int = 1 << 20,
                    maxSplitDepth: Int = 4,
                    maxCapRounds: Int = 16,
                    md5CapHash: Boolean = false): DataFrame = {
    semanticDedupFrom(corpus,
      assignCells(
        corpus.select(col(idCol).as("__id"), col(vecCol).as("__vec")),
        centroids, "__vec", 1),
      threshold, idCol, maxCellSize, maxSplitDepth, maxCapRounds, md5CapHash)
  }

  /** [[semanticDedup]] over a TWO-LEVEL quantizer
    * ([[trainHierQuantizer]]): identical pair/component/anti-join
    * semantics, but the per-row assignment costs ~2·√nCells cosines
    * instead of nCells — the flat-assignment term is what kept the
    * bounded-sample SemDeDup decade super-linear (PLANS.md round 10). */
  def semanticDedupHier(corpus: DataFrame, quant: HierQuantizer,
                        threshold: Double, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        maxCellSize: Int = 1 << 20,
                        maxSplitDepth: Int = 4,
                        maxCapRounds: Int = 16,
                        md5CapHash: Boolean = false): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    semanticDedupFrom(corpus,
      assignCellsHier(
        corpus.select(col(idCol).as("__id"), col(vecCol).as("__vec")),
        quant, "__vec"),
      threshold, idCol, maxCellSize, maxSplitDepth, maxCapRounds, md5CapHash)
  }

  /** Shared tail of the SemDeDup variants: cap the cells, self-join
    * within cells, contract components, anti-join the losers out.
    * `assigned0In` must carry (cell_id, __id, __vec). */
  private def semanticDedupFrom(corpus: DataFrame, assigned0In: DataFrame,
                                threshold: Double, idCol: String,
                                maxCellSize: Int, maxSplitDepth: Int,
                                maxCapRounds: Int,
                                md5CapHash: Boolean): DataFrame = {
    require(threshold >= -1.0 && threshold <= 1.0,
      s"cosine threshold must be in [-1, 1], got $threshold")
    require(maxCellSize >= 2, s"maxCellSize must be >= 2, got $maxCellSize")
    val assigned0 = assigned0In
      .select(col("cell_id").cast("string").as("__cell"),
        col("__id"), col("__vec"))
      .localCheckpoint(true) // both pair sides read the same assignment
    val assigned = capCells(assigned0, maxCellSize, maxSplitDepth,
      maxCapRounds, md5CapHash)
    val a = assigned.select(col("__cell"), col("__id").as("id_a"),
      col("__vec").as("__va"))
    val b = assigned.select(col("__cell"), col("__id").as("id_b"),
      col("__vec").as("__vb"))
    val pairs = a.join(b, Seq("__cell"))
      .filter(col("id_a") < col("id_b") &&
        cosine(col("__va"), col("__vb")) >= threshold)
      .select("id_a", "id_b")
    // star contraction, not min-label propagation: SemDeDup's pair graph
    // is near-CLIQUES (every clone pair in a dup cluster passes the
    // threshold), so label-prop's static doubled edge table — 2|pairs|
    // rows checkpointed once and re-joined EVERY round — holds the whole
    // quadratic pair volume in memory for the duration (measured OOM at
    // sf100: ~10⁸ pairs from 100-clone clusters, heap-size-independent),
    // while star contraction collapses a clique to its star in one
    // round and CONTRACTS the edge set as it goes (same (id, component)
    // contract, DedupSpec-pinned equivalent; x^0.19/decade on the open
    // corpus). PLANS.md round 10.
    val losers = Dedup.connectedComponentsStar(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Skew guard for [[semanticDedup]]'s per-cell self-join: any cell
    * larger than `maxCellSize` re-introduces the quadratic term the
    * clustering exists to bound (one runaway cell at 100 TB = an
    * O(cell²) stage). Oversized cells are split by the same trick that
    * built them — nearest-of-m sub-centroids, so semantic neighbors
    * (the duplicates we're hunting) stay co-celled — recursively up to
    * `maxSplitDepth`; any cell STILL over the cap after that is
    * hash-partitioned into `ceil(n/maxCellSize)` slices, which trades
    * a bounded recall loss inside that one pathological cell for a hard
    * cost ceiling.
    *
    * Sub-centroids are hash-sampled members (expected 2·n/maxCellSize
    * per cell, deterministic in the member ids — no RNG state, no
    * per-cell sort/window, so the split itself never single-threads the
    * hot cell). Cells already within the cap pass through untouched;
    * the whole guard costs one map-side-combined size count per round
    * and touches ONLY oversized-cell rows. With the default 1M cap the
    * guard is a no-op at gate scale (q115 unchanged).
    *
    * The cap is a HARD guarantee: every round — including the
    * hash-cap rounds after sub-centroid depth is exhausted — is
    * followed by a re-count, and hash slices that land over the cap
    * (the expected slice size is cap/2, but a binomial tail can
    * overshoot) are re-sliced under the next round's salt until no
    * oversized cell remains; `maxCapRounds` bounds the hash rounds and
    * the loop FAILS FAST if exceeded rather than returning an uncapped
    * cell. `md5CapHash` selects the oracle-replayable slice hash (the
    * [[graft.operators.Dedup.md5HashFamily]] convention — any SQL
    * engine replays the residues); production stays on codegen'd
    * xxhash64. */
  private[graft] def capCells(assigned0: DataFrame, maxCellSize: Int,
                       maxSplitDepth: Int, maxCapRounds: Int = 16,
                       md5CapHash: Boolean = false): DataFrame = {
    var assigned = assigned0
    var depth = 0
    var capped = false
    while (!capped) {
      val oversized = assigned.groupBy("__cell")
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxCellSize)
        .localCheckpoint(true) // ≤ |corpus|/maxCellSize rows — tiny
      if (oversized.isEmpty) {
        Exec.releaseCheckpoint(oversized)
        capped = true
      } else {
        require(depth < maxSplitDepth + maxCapRounds,
          s"cell cap $maxCellSize not reached after $maxSplitDepth " +
            s"sub-centroid rounds + $maxCapRounds hash-cap rounds — " +
            "raise maxCapRounds (an oversized cell must never escape " +
            "the guard silently)")
        val ok = assigned.join(broadcast(oversized.select("__cell")),
          Seq("__cell"), "left_anti")
        val over = assigned.join(broadcast(oversized), Seq("__cell"))
        val split =
          if (depth < maxSplitDepth) {
            // Nearest-of-m sub-centroid split. Members are sampled as
            // centroids with probability ~m/n (m = 2·ceil(n/cap), CAPPED
            // at 64 per cell — the sampled centroids carry their vectors
            // onto the broadcast side, so m must stay bounded no matter
            // how colossal one cell is; a 64-way split per round still
            // shrinks any cell 64^maxSplitDepth-fold before the hash cap)
            // via a depth-salted hash of their id; the chosen member's
            // own id labels the sub-cell. Integer column math throughout
            // (`/` on columns is double division; use floor-casts).
            val m = least(lit(64L), greatest(lit(1L),
              floor(col("__n") * 2L / maxCellSize.toLong).cast("long")))
            val stride = greatest(lit(1L),
              floor(col("__n") / m).cast("long"))
            val subC = over
              .filter(pmod(xxhash64(col("__id"), lit(depth)), stride) === 0L)
              .select(col("__cell"), col("__id").as("__sub"),
                col("__vec").as("__cvec"))
              .localCheckpoint(true) // ≤ 2·|over|/cap rows — small side
            val withC = over.join(broadcast(subC), Seq("__cell"))
              .withColumn("__d", cosine(col("__vec"), col("__cvec")))
              .groupBy("__cell", "__id")
              .agg(max_by(col("__sub"),
                struct(col("__d"), negate(col("__sub")))).as("__best"),
                first("__vec").as("__vec_keep"))
              .select(concat(col("__cell"), lit("/"), col("__best"))
                  .as("__cell"),
                col("__id"), col("__vec_keep").as("__vec"))
            // Hash sampling can (rarely) select zero centroids for a
            // cell; those rows pass through unchanged and retry under
            // the next round's salt (or the final hash cap).
            val noC = over.join(
                broadcast(subC.select("__cell").distinct()),
                Seq("__cell"), "left_anti")
              .select("__cell", "__id", "__vec")
            withC.union(noC)
          } else {
            // Depth exhausted (sub-centroid rounds failed to break the
            // cell — e.g. all-identical vectors): hash cap into
            // 2·ceil(n/cap) slices (expected slice size cap/2, so the
            // re-count loop above converges in O(1) expected rounds).
            // The slice hash is salted by `depth` — a slice that
            // overshoots the cap re-slices under a fresh salt next
            // round instead of replaying the same split.
            val nSlices = lit(2L) * floor((col("__n") + maxCellSize - 1L) /
              maxCellSize.toLong).cast("long")
            val res =
              if (md5CapHash)
                pmod(conv(substring(md5(concat(col("__id").cast("string"),
                  lit("|"), lit(depth.toString))), 1, 14), 16, 10)
                  .cast("long"), nSlices)
              else pmod(xxhash64(col("__id"), lit(depth)), nSlices)
            over.select(concat(col("__cell"), lit("#"), res).as("__cell"),
              col("__id"), col("__vec"))
          }
        val prevAssigned = assigned
        assigned = ok.select("__cell", "__id", "__vec")
          .union(split.select("__cell", "__id", "__vec"))
          .localCheckpoint(true)
        // the new round's assignment is materialized; the previous
        // |corpus|-sized copy and this round's side tables are dead —
        // the same release discipline as every other iterative loop
        // (maxSplitDepth stacked assignment copies at 100 TB otherwise)
        if (prevAssigned ne assigned0) Exec.releaseCheckpoint(prevAssigned)
        Exec.releaseCheckpoint(oversized)
        depth += 1
      }
    }
    assigned
  }

  /** LSH-bucketed approximate top-k: candidates share a hyperplane-signature
    * bucket; exact cosine re-ranks inside the bucket.
    *
    * `nTables > 1` is the RECALL lever (single-table sign-LSH recall
    * collapses on weakly-clustered corpora — measured ~0 at 12 planes on
    * the synthetic embeddings): one `nPlanes·nTables`-bit signature is
    * computed per vector in a single narrow pass, then sliced into
    * `nTables` independent `nPlanes`-bit band buckets (the SimHash/
    * MinHash banding construction); a pair is a candidate when ANY band
    * collides. Candidate recall = 1 − (1 − q^nPlanes)^nTables for
    * per-bit agreement q, tunable without touching the corpus layout.
    *
    * Shape at 100 TB: still one signature scan and one equi-join — the
    * banded join carries (table, bucket) keys, cosine is computed BEFORE
    * the dedup shuffle (8-byte scores move, vectors don't), and the
    * per-pair max collapses band duplicates with map-side combine. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12,
              nTables: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nTables >= 1, "nTables must be >= 1")
    require(nPlanes * nTables <= 63,
      s"nPlanes*nTables must fit a long signature (<= 63), got " +
        s"$nPlanes*$nTables")
    if (nTables == 1) {
      val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
        hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
      val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
      val scored = c.join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("nbr_id"))
        .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
      topK(scored, k)
    } else {
      val mask = (1L << nPlanes) - 1
      def banded(df: DataFrame, outId: String, outVec: String): DataFrame =
        df.select(col(idCol).as(outId), col(vecCol).as(outVec),
            hyperplaneSignature(col(vecCol), nPlanes * nTables).as("__sig"))
          .select(col(outId), col(outVec), posexplode(
            array((0 until nTables).map(t =>
              shiftright(col("__sig"), t * nPlanes)
                .bitwiseAND(lit(mask))): _*)).as(Seq("__t", "bucket")))
      val c = banded(corpus, "nbr_id", "nbr_vec")
      val q = banded(queries, "query_id", "q_vec")
      val scored = c.join(broadcast(q), Seq("__t", "bucket"))
        .filter(col("query_id") =!= col("nbr_id"))
        .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
        // a pair can collide in several bands: collapse to one candidate
        // row (identical cos values — max is a no-op combine rule) so the
        // top-k heap never double-counts a neighbor
        .groupBy("query_id", "nbr_id")
        .agg(max(col("cos")).as("cos"))
      topK(scored, k)
    }
  }

  /**
   * IVF (inverted-file) approximate top-k — the scale path for ANN
   * (coarse quantizer + per-cell exact re-rank):
   *
   *  1. TRAIN: k-means over a sample of the corpus gives `nCells`
   *     centroid vectors (Spark ML KMeans — one pass over a sample, the
   *     model is a handful of dense vectors broadcast everywhere);
   *  2. INDEX: each corpus vector is assigned to its nearest centroid
   *     (narrow map; the assignment expression is the same codegen'd
   *     cosine); the corpus is then repartitionable/bucketable by
   *     `cell_id` so each cell's vectors are co-located;
   *  3. QUERY: each query probes its `nProbe` nearest cells only —
   *     candidate generation becomes an equi-join on cell_id touching
   *     nProbe/nCells of the corpus, then exact cosine re-ranks.
   *
   * At 100 TB: the index write partitions by cell_id, so a query scans
   * only its probed cells' files (partition pruning), and the re-rank
   * shuffles candidates, never the corpus.
   */
  /** Train the coarse quantizer: k-means over the corpus (or a sample —
    * pass `corpus.sample(...)` at scale). The model is nCells dense
    * vectors; the train-time UDF shim is the ONLY UDF in the engine
    * (MLlib's fit needs ml.linalg vectors; query-time paths never use
    * it). */
  def trainCentroids(corpus: DataFrame, nCells: Int,
                     vecCol: String = "embedding"): Seq[(Int, Array[Float])] = {
    val toVec = org.apache.spark.sql.functions.udf {
      (a: scala.collection.Seq[Float]) =>
        org.apache.spark.ml.linalg.Vectors.dense(a.map(_.toDouble).toArray)
    }
    val train = corpus.select(toVec(col(vecCol)).as("features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(7L).setMaxIter(10).fit(train)
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
  }

  /** The PRODUCTION quantizer trainer: k-means over a BOUNDED
    * deterministic sample instead of the full corpus. Full-set training
    * costs rows × nCells × iters — with nCells grown ∝ rows (fixed cell
    * size), that term is quadratic per decade and was measured doing
    * exactly that (PLANS.md second-decade table: IVF x^0.81, SemDeDup
    * x^0.55 at sf10 under full-set training). Bounding the sample makes
    * training ∝ sampleBudget × nCells — linear in nCells, independent
    * of corpus size.
    *
    * The sample is the `sampleBudget` corpus vectors with the LOWEST
    * xxhash64(id) — a deterministic uniform draw with no RNG state
    * (the [[Scale]] seeded-rank convention): same corpus → same sample
    * → same centroids on any cluster layout. `orderBy(limit)` plans as
    * TakeOrderedAndProject — per-partition bounded top-N, merged once —
    * so the corpus is never globally sorted and never rescanned across
    * k-means iterations (the sample is checkpointed for the iterative
    * fit, then released).
    *
    * Pair with the frozen-quantizer append paths
    * ([[appendToIvfIndex]]/[[appendToIvfPqIndex]]) and versioned
    * retrain cutover ([[refreshIvfIndex]]) for the full 100 TB story:
    * train once on the budget, append forever against the frozen model,
    * retrain rarely behind an atomic version swap. */
  def trainCentroidsSampled(corpus: DataFrame, nCells: Int,
                            sampleBudget: Int = 8192,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): Seq[(Int, Array[Float])] = {
    require(sampleBudget >= nCells,
      s"sampleBudget ($sampleBudget) must be >= nCells ($nCells) — " +
        "k-means needs at least one point per centroid; size the budget " +
        "as samples-per-cell x nCells (32-256 per cell is the usual range)")
    val sample = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleBudget)
      .select(col(vecCol))
      .localCheckpoint(true)
    try trainCentroids(sample, nCells, vecCol)
    finally Exec.releaseCheckpoint(sample)
  }

  /** A TWO-LEVEL coarse quantizer (the inverted-multi-index idea:
    * Babenko & Lempitsky, "The Inverted Multi-Index", CVPR 2012 — here
    * as a residual-free top/sub split). `top` holds k1 ≈ √nCells
    * Lloyd-trained centroids; `sub(c1)` holds ≤ k2 ≈ nCells/k1
    * sub-centroids for top cell c1, carrying GLOBAL cell ids
    * `c1·k2 + j`. Why: a FLAT quantizer with cells grown ∝ rows makes
    * per-row assignment cost rows × nCells — quadratic per decade, and
    * measured as the residual super-linear term once training is
    * bounded (PLANS.md round 10: ivfsampled x^0.63). Two levels cost
    * k1 + k2 ≈ 2·√nCells cosines per row — and keep the top level on
    * the codegen'd ≤64-literal path up to nCells ≈ 4096. */
  final case class HierQuantizer(k2: Int,
      top: Seq[(Int, Array[Float])],
      sub: Map[Int, Seq[(Int, Array[Float])]]) {
    def nCells: Int = sub.valuesIterator.map(_.size).sum
  }

  /** Train a [[HierQuantizer]] on a bounded deterministic sample: the
    * top level is Lloyd k-means over the [[trainCentroidsSampled]]
    * hash-rank sample; each top cell's sub-centroids start as its k2
    * LOWEST-HASH sample members (the [[capCells]] sub-centroid
    * convention: deterministic in the member ids, no per-cell
    * iteration) and then take `subLloydIters` Lloyd steps over the
    * sample (default 2 — measured at the sf1.0 operating point
    * (160 cells, 5% probed): recall@10 0.883→0.896, pair recall
    * 0.098→0.112, p99 cell size 347→217 vs raw seeds; PLANS.md round
    * 10).
    *
    * The whole fit runs DRIVER-LOCALLY on ONE bounded collect: the
    * sample is model-sized BY CONSTRUCTION (≤ max(budget, 4·nCells) ×
    * dim floats — the bounded-small-side convention; the 4·nCells
    * floor is the r12 budget/nCells coupling, see the body comment
    * for the memory consequence), arrives in xxhash64-rank
    * order from a TakeOrderedAndProject (per-partition bounded top-N,
    * no global sort, corpus scanned exactly once), and every Lloyd
    * step after that is plain in-process math — the distributed
    * formulation spent ~15 Spark job round-trips plus two MLlib fits
    * per refresh ON THE SAME ≤8192 ROWS, pure scheduling overhead
    * (measured: 21 s → ~1 s per refresh at gate scale; PLANS.md round
    * 10). Deterministic end to end: fixed sample order, fixed seeds
    * (first-k points), single-threaded accumulation — same corpus →
    * same quantizer on any cluster layout. Assignment conventions
    * mirror the executor-side expressions exactly: top cell by COSINE
    * with ties to the lower id ([[assignCells]]), sub cell via the
    * [[assignCellsHier]] fallback (a top cell with no sub entry → its
    * first global id), so the trained model and the codegen'd
    * assignment agree on every boundary. */
  def trainHierQuantizer(corpus: DataFrame, nCells: Int,
                         sampleBudget: Int = 8192,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         subLloydIters: Int = 2): HierQuantizer = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    val k1 = math.max(1, math.ceil(math.sqrt(nCells.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(nCells.toDouble / k1).toInt)
    require(sampleBudget >= k1,
      s"sampleBudget ($sampleBudget) must be >= k1 ($k1)")
    // Budget/nCells COUPLING (r12 verdict item 2): at nCells ≫ budget
    // most sub cells would get ≤1 Lloyd seed and recall would quietly
    // degrade — nothing in the math fails, the quantizer is just bad.
    // The effective budget therefore auto-scales to ≥4 samples per
    // requested cell (32–256 is the quality range; 4 is the floor
    // below which cells stop being distinguishable from their seeds).
    // MEMORY CONSEQUENCE, since the fit is driver-local by design: the
    // collect is effBudget × dim floats — 4·nCells·dim·4 B at the
    // floor, e.g. ~12 GB for 10⁶ cells × 768 dims. Size driver memory
    // for it, or train fewer cells; the budget no longer silently
    // under-trains.
    val effBudget = math.max(sampleBudget,
      math.min(Int.MaxValue.toLong, 4L * nCells).toInt)
    // the ONE distributed step: bounded top-N by hash rank
    val sample: Array[Array[Float]] = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(effBudget)
      .select(col(vecCol))
      .collect().map(_.getSeq[Float](0).toArray)
    val pts = sample.map(_.map(_.toDouble))
    val topD = lloydLocal(pts, k1, iters = 10)
    val top = topD.zipWithIndex.map { case (c, i) =>
      (i, c.map(_.toFloat)) }.toSeq
    val topD2 = topD.zipWithIndex.map { case (c, i) => (i, c) }.toIndexedSeq
    // Per-point TOP assignment is pure (reads pts(i) and the frozen top
    // centroids, writes its own slot) — fan it out over cores; the winner
    // per point is the same in any execution order, so the quantizer is
    // byte-identical to the single-threaded fit. Computed ONCE: the top
    // level never moves during sub refinement, where the old code
    // recomputed it per point per Lloyd iteration.
    val topAssign = new Array[Int](pts.length)
    parallelIndices(pts.length,
      pts.length.toLong * k1 * (if (pts.isEmpty) 0 else pts(0).length)) {
      i => topAssign(i) = nearestLocal(pts(i), topD2)
    }
    // sub-centroid seeds: the k2 LOWEST-HASH members of each top cell
    // (the sample is already in hash-rank order)
    val seedsByCell = scala.collection.mutable.LinkedHashMap[Int,
      scala.collection.mutable.ArrayBuffer[Array[Float]]]()
    pts.indices.foreach { i =>
      val c1 = topAssign(i)
      val buf = seedsByCell.getOrElseUpdate(c1,
        scala.collection.mutable.ArrayBuffer.empty)
      if (buf.size < k2) buf += sample(i)
    }
    var quant = HierQuantizer(k2, top, seedsByCell.map { case (c1, vs) =>
      c1 -> vs.toSeq.zipWithIndex.map { case (v, j) => (c1 * k2 + j, v) }
    }.toMap)
    // Lloyd refinement of the sub-centroid seeds over the sample:
    // tightens the seed Voronoi balance and recall; empty cells drop
    // from the map, ids stay stable (c1·k2 + j)
    for (_ <- 1 to subLloydIters) {
      val q = quant
      // each present cell's sub-centroids in double precision ONCE per
      // iteration — the old code re-built this list per POINT
      val subD: Map[Int, IndexedSeq[(Int, Array[Double])]] =
        q.sub.map { case (c1, scs) =>
          c1 -> scs.map { case (g, v) =>
            (g, v.map(_.toDouble)) }.toIndexedSeq
        }
      // sub assignment: pure per point (top cell is frozen in topAssign,
      // sub centroids frozen for the iteration) — parallel, exact
      val gAssign = new Array[Int](pts.length)
      parallelIndices(pts.length,
        pts.length.toLong * k2 * (if (pts.isEmpty) 0 else pts(0).length)) {
        i =>
          val c1 = topAssign(i)
          gAssign(i) = subD.get(c1) match {
            case None => c1 * k2 // the assignCellsHier fallback
            case Some(scs) => nearestLocal(pts(i), scs)
          }
      }
      // ACCUMULATION — O(n·dim), negligible — stays sequential in
      // hash-rank order: FP addition is order-sensitive, and per-cluster
      // sums must stay byte-identical to the single-threaded fit
      val sums = scala.collection.mutable.Map[Int, Array[Double]]()
      val counts = scala.collection.mutable.Map[Int, Long]()
      pts.indices.foreach { i =>
        val p = pts(i)
        val g = gAssign(i)
        val s = sums.getOrElseUpdate(g, new Array[Double](p.length))
        var j = 0; while (j < p.length) { s(j) += p(j); j += 1 }
        counts(g) = counts.getOrElse(g, 0L) + 1L
      }
      val refined = sums.toSeq.map { case (g, s) =>
        (g, Array.tabulate(s.length)(j => (s(j) / counts(g)).toFloat))
      }.groupBy(_._1 / k2)
        .map { case (c1, cs) => c1 -> cs.sortBy(_._1).toSeq }
      quant = HierQuantizer(k2, top, refined)
    }
    quant
  }

  /** Cosine on raw double vectors — the driver-local twin of [[cosine]];
    * zero vectors score 0. Hoisted from [[trainHierQuantizer]] so the
    * distributed trainer and its spec share the exact bits. */
  private[graft] def cosLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
    while (j < a.length) {
      dot += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Nearest candidate by cosine, ties to the lower id — the in-process
    * twin of the [[assignCells]] executor expression. */
  private[graft] def nearestLocal(p: Array[Double],
      cands: IndexedSeq[(Int, Array[Double])]): Int = {
    var bestId = cands(0)._1; var bestSim = Double.NegativeInfinity
    cands.foreach { case (id, c) =>
      val s = cosLocal(p, c)
      if (s > bestSim || (s == bestSim && id < bestId)) {
        bestSim = s; bestId = id
      }
    }
    bestId
  }

  /** Work floor below which the per-point training loops stay
    * single-threaded: the parallel fan-out is bit-identical at any size
    * (pure per-point writes to distinct slots), the floor only avoids
    * common-pool overhead on gate-scale samples. ~16M flops ≈ 1 ms. */
  private val ParallelTrainMinFlops: Long = 1L << 24

  /** f(i) for i in [0, n), over the JVM common pool when `flops` clears
    * [[ParallelTrainMinFlops]], else inline. `f` must be pure per index
    * (write only slot i) — then the result is independent of schedule. */
  private def parallelIndices(n: Int, flops: Long)(f: Int => Unit): Unit =
    if (flops >= ParallelTrainMinFlops)
      java.util.stream.IntStream.range(0, n).parallel().forEach(i => f(i))
    else { var i = 0; while (i < n) { f(i); i += 1 } }

  /** One top cell's sub-centroid training, EXACTLY as the driver-local
    * [[trainHierQuantizer]] computes it (the sub refinement decomposes
    * by top cell: the top level is frozen during refinement, so no point
    * changes top cell between iterations, and each global id g lives in
    * [c1·k2, c1·k2+k2)): seeds = the first ≤k2 members in hash-rank
    * order, then `iters` Lloyd steps where per-sub-cell sums accumulate
    * in member rank order (FP-order-exact), means truncate to float, and
    * emptied sub cells drop. `members` MUST be the cell's sample vectors
    * in hash-rank order. */
  private[graft] def subCellRefine(c1: Int, k2: Int, iters: Int,
      members: Array[Array[Float]]): Seq[(Int, Array[Float])] = {
    val pts = members.map(_.map(_.toDouble))
    var cur: Seq[(Int, Array[Float])] =
      members.take(k2).zipWithIndex.map { case (v, j) => (c1 * k2 + j, v) }
    for (_ <- 1 to iters) {
      val scs = cur.map { case (g, v) =>
        (g, v.map(_.toDouble)) }.toIndexedSeq
      val sums = scala.collection.mutable.Map[Int, Array[Double]]()
      val counts = scala.collection.mutable.Map[Int, Long]()
      pts.foreach { p =>
        val g = nearestLocal(p, scs)
        val s = sums.getOrElseUpdate(g, new Array[Double](p.length))
        var j = 0; while (j < p.length) { s(j) += p(j); j += 1 }
        counts(g) = counts.getOrElse(g, 0L) + 1L
      }
      cur = sums.toSeq.map { case (g, s) =>
        (g, Array.tabulate(s.length)(j => (s(j) / counts(g)).toFloat))
      }.sortBy(_._1)
    }
    cur
  }

  /** [[trainHierQuantizer]] with the SUB level trained ON EXECUTORS —
    * the r14-verdict #1 item: the driver-local fit collects
    * effBudget = max(budget, 4·nCells) sample vectors (~12 GB at 10⁶
    * cells × 768 dims) and runs every Lloyd step on the driver, which is
    * the last structural 100 TB ceiling in the ANN family. Here the
    * driver collects only the TOP-level training prefix (≤ topBudget
    * rows — k1 ≈ √nCells needs ~4·√nCells points, so a 64k default
    * covers 10⁸ cells), trains the k1 top centroids with the same
    * [[lloydLocal]], and the effBudget sample never lands on the driver:
    * each point's top cell is assigned executor-side with the same
    * [[nearestLocal]] bits against the broadcast top level, the sample
    * shuffles ONCE by top cell (groupByKey — the bytes the driver
    * previously collect()ed now cross the network instead, ~4·nCells·dim
    * floats spread over k1 groups of ~4·√nCells points), and
    * [[subCellRefine]] runs per group in hash-rank order. The collect at
    * the end is model-sized (≤ nCells × dim floats — the quantizer
    * itself).
    *
    * EQUALITY CONTRACT (spec-pinned): with `topBudget >= effBudget` the
    * top prefix is the whole sample and the result is BIT-IDENTICAL to
    * [[trainHierQuantizer]] — same seeds, same sums in the same order,
    * same tie-breaks (assumes xxhash64-tie-free ids, the same caveat the
    * driver path's orderBy carries). With 4·nCells > topBudget the top
    * level trains on the topBudget lowest-hash prefix instead — a
    * different, equally deterministic quantizer; that regime is exactly
    * where the driver-local fit stops being runnable at all. */
  def trainHierQuantizerDistributed(corpus: DataFrame, nCells: Int,
      sampleBudget: Int = 8192,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      subLloydIters: Int = 2,
      topBudget: Int = 65536): HierQuantizer = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    val k1 = math.max(1, math.ceil(math.sqrt(nCells.toDouble)).toInt)
    val k2 = math.max(1, math.ceil(nCells.toDouble / k1).toInt)
    require(sampleBudget >= k1,
      s"sampleBudget ($sampleBudget) must be >= k1 ($k1)")
    require(topBudget >= k1,
      s"topBudget ($topBudget) must be >= k1 ($k1)")
    val effBudget = math.max(sampleBudget,
      math.min(Int.MaxValue.toLong, 4L * nCells).toInt)
    val spark = corpus.sparkSession
    import spark.implicits._
    // the ONE corpus-sized step, shared by both levels: bounded top-N by
    // hash rank (TakeOrderedAndProject — no global sort), checkpointed so
    // the corpus scans exactly once
    val sampleDf = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(effBudget)
      .select(xxhash64(col(idCol)).as("_1"), col(vecCol).as("_2"))
      .localCheckpoint(true)
    try {
      val topN = math.min(effBudget, topBudget)
      val topPts = sampleDf.orderBy(col("_1")).limit(topN)
        .select(col("_2")).collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      val topD = lloydLocal(topPts, k1, iters = 10)
      val top = topD.zipWithIndex.map { case (c, i) =>
        (i, c.map(_.toFloat)) }.toSeq
      val topB = spark.sparkContext.broadcast(
        topD.zipWithIndex.map { case (c, i) => (i, c) }.toIndexedSeq)
      val k2L = k2; val itersL = subLloydIters
      val subRows = sampleDf.as[(Long, Seq[Float])]
        .map { case (rk, v) =>
          val p = v.toArray.map(_.toDouble)
          (nearestLocal(p, topB.value), rk, v)
        }
        .groupByKey(_._1)
        .flatMapGroups { (c1: Int, it: Iterator[(Int, Long, Seq[Float])]) =>
          // hash-rank order within the cell = the driver-local pts order
          // restricted to this cell (sortBy is stable; distinct hashes
          // assumed, as in the driver path)
          val members = it.toArray.sortBy(_._2).map(_._3.toArray)
          subCellRefine(c1, k2L, itersL, members)
            .map { case (g, cent) => (c1, g, cent.toSeq) }
        }
        .collect() // model-sized: ≤ nCells × dim floats
      topB.destroy()
      val sub = subRows.groupBy(_._1).map { case (c1, rows) =>
        c1 -> rows.sortBy(_._2)
          .map { case (_, g, cent) => (g, cent.toArray) }.toSeq
      }
      HierQuantizer(k2, top, sub)
    } finally Exec.releaseCheckpoint(sampleDf)
  }

  /** Narrow two-step nearest-cell assignment under a [[HierQuantizer]]:
    * argmin over the k1 top centroids (the single-literal HOF pass of
    * [[topScoredExpr]] — the only formulation since the round-10 JIT
    * cliff finding), then argmin over THAT cell's
    * sub-centroids via one `element_at` on a literal map — no join, no
    * window, no Exchange, exactly like [[assignCells]] but ~2·√nCells
    * cosines per row instead of nCells. A top cell with no sub entry
    * (a Lloyd centroid that captured no sample member) falls back to
    * its first global id, keeping `cell_id` total. */
  /** Assignment-side sub-literal ceiling — LOWER than the probe-side
    * [[SubLiteralMaxFloats]] because assignment is corpus-side by
    * definition: the broadcast's fixed per-job overhead amortizes over
    * every corpus row, and the `subjoinscale` sweep measured the join
    * formulation FASTER per row from 1024 cells × 64 dims (65k floats)
    * up — 6.7 vs 8.8 µs/row there, 3.8× faster at 64k cells — so
    * corpus-scale assignment switches as soon as the join wins, while
    * small query batches keep the zero-job literal until the literal
    * itself becomes the problem. */
  val AssignSubLiteralMaxFloats: Long = 64L << 10

  def assignCellsHier(df: DataFrame, quant: HierQuantizer,
                      vecCol: String,
                      maxSubLiteralFloats: Long =
                        AssignSubLiteralMaxFloats)
  : DataFrame = {
    val withC1 = df.withColumn("__c1", topCellExpr(quant, vecCol))
    // the sub level rides as a plan literal under the measured ceiling
    // and as a broadcast join above it ([[SubLiteralMaxFloats]]); both
    // resolve the SAME (__c1 → __subs) lookup, so the argmin below is
    // shared and the paths are row-identical by construction
    val withSubs =
      if (subLiteralFloats(quant) <= maxSubLiteralFloats)
        withC1.withColumn("__subs",
          element_at(subMapLit(quant), col("__c1")))
      else
        withC1.join(broadcast(subTableDF(df.sparkSession, quant)),
          Seq("__c1"), "left")
    withSubs
      .withColumn("cell_id",
        when(col("__subs").isNull, col("__c1") * lit(quant.k2))
          .otherwise(array_min(transform(col("__subs"), c =>
            struct((lit(0.0) - cosine(col(vecCol), c.getField("_2")))
              .as("neg_sim"), c.getField("_1").as("cell_id"))))
            .getField("cell_id")))
      .drop("__c1", "__subs")
  }

  /** Query-side probing under a [[HierQuantizer]]: rank the k1 top
    * cells, take the best `probeTop`, score ALL their sub-centroids
    * (probeTop × k2 cosines), and explode the best `nProbe` global cell
    * ids — the multi-sequence probe of the inverted multi-index,
    * flattened to one narrow expression chain over the (small) query
    * side. A top cell with NO sub entry contributes its fallback
    * global id (c1·k2 — exactly where [[assignCellsHier]] routes such
    * rows) scored by the top-level similarity, so fallback-assigned
    * corpus rows stay probe-reachable and a query whose best top cells
    * all lack sub entries still yields candidates instead of silently
    * vanishing from the output. */
  def probeCellsHier(df: DataFrame, quant: HierQuantizer, vecCol: String,
                     probeTop: Int, nProbe: Int,
                     maxSubLiteralFloats: Long = SubLiteralMaxFloats)
  : DataFrame =
    withHierCandArray(df, quant, vecCol, probeTop, maxSubLiteralFloats)
      .withColumn("cell_id",
        explode(slice(sort_array(col("__cand")), 1, nProbe)
          .getField("cell_id")))
      .drop("__cand")

  /** The (neg_sim, cell_id) candidate array behind [[probeCellsHier]]:
    * probeTop top cells' sub-centroids scored (probeTop × k2 cosines),
    * sub-less top cells contributing their fallback global id. */
  private def hierCandArray(quant: HierQuantizer, vecCol: String,
                            probeTop: Int): Column = {
    val subLit = subMapLit(quant)
    flatten(transform(
      slice(sort_array(topScoredExpr(quant, vecCol)), 1, probeTop), t => {
        val subs = element_at(subLit, t.getField("cell_id"))
        when(subs.isNull,
          array(struct(t.getField("neg_sim").as("neg_sim"),
            (t.getField("cell_id") * lit(quant.k2)).as("cell_id"))))
          .otherwise(transform(subs, c =>
            struct((lit(0.0) - cosine(col(vecCol), c.getField("_2")))
              .as("neg_sim"), c.getField("_1").as("cell_id"))))
      }))
  }

  /** Attach the probe candidate array as `__cand`, resolving the sub
    * level by the same literal-vs-broadcast ceiling as
    * [[assignCellsHier]] ([[SubLiteralMaxFloats]]). The join
    * formulation keeps the probe fully narrow: the probeTop best top
    * cells join the broadcast (top cell → sub-centroids) table one
    * slot at a time — probeTop BroadcastHashJoins in one stage, no
    * shuffle of the query side, no row explosion (top cell ids are
    * unique join keys) — and the per-slot candidate arrays concat in
    * slot order, so the assembled array is ELEMENT-IDENTICAL to the
    * literal path's and every downstream sort/slice/cut agrees
    * bit-for-bit (spec-pinned). */
  private def withHierCandArray(df: DataFrame, quant: HierQuantizer,
                                vecCol: String, probeTop: Int,
                                maxSubLiteralFloats: Long): DataFrame = {
    if (subLiteralFloats(quant) <= maxSubLiteralFloats)
      return df.withColumn("__cand", hierCandArray(quant, vecCol, probeTop))
    val spark = df.sparkSession
    val candType = "array<struct<neg_sim:double,cell_id:int>>"
    // ONE side table shared by every slot (r13 ADVICE): the per-slot
    // projections below differ only in alias names, which plan
    // canonicalization strips, so all probeTop BroadcastExchanges
    // canonicalize equal over the SAME parallelize-backed LogicalRDD
    // and ReuseExchange ships the sub-centroid data once per job —
    // a fresh subTableDF per slot would be probeTop distinct RDD
    // lineages that never canonicalize equal, multiplying driver
    // memory and broadcast traffic by probeTop at exactly the
    // large-quantizer scale this path exists for (plan-asserted:
    // SimilaritySpec requires ReusedExchange in the forced-join probe).
    val subShared = subTableDF(spark, quant)
    var cur = df.withColumn("__top",
      slice(sort_array(topScoredExpr(quant, vecCol)), 1, probeTop))
    (0 until probeTop).foreach { i =>
      val sub = subShared
        .select(col("__c1").as(s"__c1_$i"), col("__subs").as(s"__subs_$i"))
      cur = cur.join(broadcast(sub),
        try_element_at(col("__top"), lit(i + 1)).getField("cell_id")
          === col(s"__c1_$i"), "left")
    }
    val parts = (0 until probeTop).map { i =>
      // try_element_at: a trailing slot beyond the array (probeTop >
      // k1) is null, not an ANSI index error
      val t = try_element_at(col("__top"), lit(i + 1))
      // a quantizer with fewer than probeTop top cells leaves trailing
      // slots null → empty contribution, same as the literal path's
      // shorter slice
      when(t.isNull, array().cast(candType))
        .when(col(s"__subs_$i").isNull,
          array(struct(t.getField("neg_sim").as("neg_sim"),
            (t.getField("cell_id") * lit(quant.k2)).as("cell_id"))))
        .otherwise(transform(col(s"__subs_$i"), c =>
          struct((lit(0.0) - cosine(col(vecCol), c.getField("_2")))
            .as("neg_sim"), c.getField("_1").as("cell_id"))))
    }
    cur.withColumn("__cand", flatten(array(parts: _*)))
      .drop(col("__top"))
      .drop((0 until probeTop).flatMap(i =>
        Seq(s"__c1_$i", s"__subs_$i")): _*)
  }

  /** Every reachable candidate cell of the probeTop top cells, RANKED
    * per input row by ascending neg_sim (i.e. best cell first, rank 0)
    * — the full reach [[probeCellsHier]] cuts at nProbe, exposed for
    * the adaptive probe's prefix selection. */
  def probeCellsHierRanked(df: DataFrame, quant: HierQuantizer,
                           vecCol: String, probeTop: Int,
                           maxSubLiteralFloats: Long = SubLiteralMaxFloats)
  : DataFrame =
    withHierCandArray(df, quant, vecCol, probeTop, maxSubLiteralFloats)
      .select(col("*"),
        posexplode(sort_array(col("__cand"))).as(Seq("__rank", "__c")))
      .withColumn("cell_id", col("__c.cell_id"))
      .drop("__cand", "__c")

  /** ADAPTIVE probe (r11 verdict item 3, the probe-side lever): keep
    * the best-ranked cells per query until their CUMULATIVE row count
    * reaches `minCandidates` — a query landing in small cells
    * automatically probes more of them, one in a dense region stops
    * early, so the candidate pool (hence recall) stops depending on a
    * lucky fixed nProbe. `cellSizes` is the ≤nCells (cell_id, cnt)
    * table ([[indexCellSizes]]) — collected once (nCells longs,
    * strictly smaller than the quantizer's own centroid literals the
    * family already carries) and embedded as a map literal, so the
    * prefix cut runs INSIDE one `aggregate` HOF over the query's
    * sorted ≤ probeTop·k2 candidate array: ZERO joins, ZERO shuffles,
    * fully narrow. (The first formulation ranked-exploded the reach
    * and cut with a per-query window — at a 400k-query batch over a
    * 16k-cell index that shuffled a 100M-row reach table and measured
    * 2.75× the fixed probe; this one adds only per-row CPU.) A cell
    * absent from `cellSizes` (empty on disk) counts 0 and rides along
    * — no candidates, no cost. The first cell is always kept
    * (cum-before = 0 < minCandidates), so the probe is total. `df`
    * must carry the query's vector in `vecCol`. */
  def probeCellsHierAdaptive(df: DataFrame, quant: HierQuantizer,
                             vecCol: String, probeTop: Int,
                             minCandidates: Long,
                             cellSizes: DataFrame,
                             maxSubLiteralFloats: Long = SubLiteralMaxFloats,
                             maxSizeLiteralLongs: Long = SizeLiteralMaxLongs)
  : DataFrame = {
    require(minCandidates >= 1, s"minCandidates must be >= 1")
    val sizes: Map[Int, Long] = cellSizes
      .select(col("cell_id").cast("int"), col("cnt").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // DENSE array indexed by global cell id (= c1·k2 + j by
    // construction, so ids live in [0, (maxC1+1)·k2)). Cells empty on
    // disk hold 0.
    val maxCell = (quant.top.map(_._1).max + 1) * quant.k2
    val cand = withHierCandArray(df, quant, vecCol, probeTop,
      maxSubLiteralFloats)
    if (maxCell <= maxSizeLiteralLongs) {
      // LITERAL path: element_at on an ARRAY literal is O(1), where the
      // first cut's MAP literal was an O(nCells) linear scan per lookup —
      // ~4× the whole probe at a 16k-cell index (PLANS round 12).
      val szLit = typedLit((0 until maxCell).map(i => sizes.getOrElse(i, 0L)))
      val empty = struct(lit(0L).as("cum"),
        typedLit(Seq.empty[Int]).as("kept"))
      cand
        .withColumn("__kept",
          aggregate(
            sort_array(col("__cand")), empty,
            (acc, c) => {
              val cnt = element_at(szLit, c.getField("cell_id") + 1)
              when(acc.getField("cum") < minCandidates,
                struct((acc.getField("cum") + cnt).as("cum"),
                  concat(acc.getField("kept"),
                    array(c.getField("cell_id"))).as("kept")))
                .otherwise(acc)
            }))
        .withColumn("cell_id", explode(col("__kept").getField("kept")))
        .drop("__kept")
    } else {
      // PLAN-BOUNDED path (r13/r14 verdict carry: the literal embeds one
      // long per global cell id in EVERY adaptive plan — ~8 MB of plan
      // at 10⁶ cells, re-serialized per query batch and hostile to
      // codegen). Above the ceiling the same dense array rides a torrent
      // BROADCAST VARIABLE — shipped to each executor once per job, O(1)
      // lookups, zero plan growth — and the identical prefix-cut walk
      // runs in one deterministic Scala function per row over the ≤
      // probeTop·k2 sorted candidates. Still ZERO joins and ZERO
      // shuffles; the only trade is leaving codegen for this one
      // projection, which is why the literal path keeps the small-index
      // regime (crossover measured in PLANS.md r15). Parity with the
      // literal path is spec-pinned (SimilaritySpec).
      val dense: Array[Long] =
        Array.tabulate(maxCell)(i => sizes.getOrElse(i, 0L))
      val bc = df.sparkSession.sparkContext.broadcast(dense)
      val minC = minCandidates
      val keptFn = udf { (cells: Seq[Int]) =>
        val arr = bc.value
        var cum = 0L
        val kept = Seq.newBuilder[Int]
        var open = true
        cells.foreach { cid =>
          if (open) {
            if (cum < minC) { cum += arr(cid); kept += cid }
            else open = false
          }
        }
        kept.result()
      }
      cand
        .withColumn("__kept",
          keptFn(transform(sort_array(col("__cand")),
            c => c.getField("cell_id"))))
        .withColumn("cell_id", explode(col("__kept")))
        .drop("__kept")
    }
  }

  /** Per-cell row counts of a persisted index (union of roots) — the
    * ≤nCells side table the adaptive probe cuts on. One narrow scan
    * (cell_id is a partition column; no data columns read). Compute it
    * once per index version and reuse across query batches. */
  def indexCellSizes(spark: org.apache.spark.sql.SparkSession,
                     paths: Seq[String]): DataFrame =
    paths.map(p => spark.read.parquet(p).select("cell_id"))
      .reduce(_ unionByName _)
      .groupBy("cell_id").agg(count(lit(1)).as("cnt"))

  /** Persist the (cell_id, cnt) table of a just-written `cells`
    * directory as a version ARTIFACT (`v<n>/cellsizes`, one tiny
    * file): at 100 TB an index version holds ~nCells directories of
    * parquet whose footers [[indexCellSizes]] would re-enumerate on
    * EVERY adaptive query batch — a per-batch listing cost that grows
    * with the index, for a table the writer can emit once at write
    * time (it just produced those rows). Written BEFORE the
    * `_COMMITTED` marker like every other artifact, so a committed
    * version always carries it. */
  private def writeCellSizes(spark: org.apache.spark.sql.SparkSession,
                             cellsPath: String, sizesPath: String,
                             preWrite: Option[DataFrame] = None): Unit =
    preWrite
      // aggregate from the writer's own in-flight frame when its
      // re-evaluation is CHEAP (r12 ADVICE): compaction's frame is a
      // column-pruned scan of base cells + micro-batch deltas + one
      // broadcast anti-join — far less than the ~nCells footer-scan
      // tasks of the readback (measured 28 s at 8189 one-file dirs).
      // Refresh keeps the readback: its frame re-runs the 2·√nCells
      // assignment cosines per row, which costs more than the scan.
      .map(_.groupBy("cell_id").agg(count(lit(1)).as("cnt")))
      .getOrElse(indexCellSizes(spark, Seq(cellsPath)))
      .coalesce(1).write.mode("overwrite").parquet(sizesPath)

  /** The (cell_id, cnt) side table of a committed version: the
    * `cellsizes` artifact when the version carries one (every index
    * written at r12+), else recomputed from the cells (back-compat
    * with older roots). Sizes describe the cells AS WRITTEN — live
    * tombstones masked at probe time may overcount a cell slightly,
    * which only deepens the adaptive cut (never starves it). */
  def readCellSizes(spark: org.apache.spark.sql.SparkSession,
                    root: String, version: Int): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$root/v$version/cellsizes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(p.toString)
    else indexCellSizes(spark, Seq(s"$root/v$version/cells"))
  }

  /** [[queryIvfPqIndexHierPaths]] with the ADAPTIVE probe: the probe
    * depth per query is driven by `minCandidates = candidateFactor·k`
    * cumulative candidate rows instead of a fixed nProbe — the
    * probe-side recall lever for deployments that do NOT keep original
    * vectors at query time (the [[exactRerank]] tier's precondition).
    * Same size-aware probe join and tombstone contract as the fixed
    * probe; `maxBroadcastProbeRows` compares against the REACH bound
    * queries × probeTop·k2 (the adaptive cut can only shrink it). */
  def queryIvfPqIndexHierAdaptive(spark: org.apache.spark.sql.SparkSession,
                                  paths: Seq[String], hq: HierQuantizer,
                                  cb: PqCodebooks, queries: DataFrame,
                                  k: Int, probeTop: Int = 4,
                                  candidateFactor: Int = 4,
                                  cellSizes: Option[DataFrame] = None,
                                  idCol: String = "vec_id",
                                  vecCol: String = "embedding",
                                  tombstones: Option[DataFrame] = None,
                                  maxBroadcastProbeRows: Long = 1L << 20,
                                  maxSubLiteralFloats: Long =
                                    SubLiteralMaxFloats,
                                  queryCountHint: Option[Long] = None)
  : DataFrame = {
    require(paths.nonEmpty, "need at least one index root")
    val sizes = cellSizes.getOrElse(indexCellSizes(spark, paths))
    val probed = probeCellsHierAdaptive(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      hq, "q_vec", probeTop, candidateFactor.toLong * k, sizes,
      maxSubLiteralFloats)
    val broadcastProbe = queryCountHint.getOrElse(queries.count()) *
      probeTop * hq.k2 <= maxBroadcastProbeRows
    adcProbeTopK(spark, paths, probed, cb, k, tombstones, broadcastProbe)
  }

  /** The versioned convenience of [[queryIvfPqIndexHierAdaptive]]:
    * resolves the committed version, loads its artifacts (the
    * persisted `cellsizes` table included — no per-batch index
    * re-enumeration; see [[readCellSizes]]), masks live tombstones. */
  def queryVersionedIvfPqIndexHierAdaptive(
      spark: org.apache.spark.sql.SparkSession, root: String,
      queries: DataFrame, k: Int, probeTop: Int = 4,
      candidateFactor: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastProbeRows: Long = 1L << 20,
      queryCountHint: Option[Long] = None): DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val hq = readHierQuantizer(spark, s"$root/v$v/quantizer")
    val cb = readPqCodebooks(spark, root, v)
    queryIvfPqIndexHierAdaptive(spark, Seq(s"$root/v$v/cells"), hq, cb,
      queries, k, probeTop, candidateFactor,
      Some(readCellSizes(spark, root, v)), idCol, vecCol,
      tombstones = readTombstoneIds(spark, root),
      maxBroadcastProbeRows = maxBroadcastProbeRows,
      queryCountHint = queryCountHint)
  }

  /** IVF top-k under a [[HierQuantizer]] — [[ivfTopK]] with the flat
    * assignment swapped for the two-level one; candidate generation and
    * exact re-rank are identical. */
  def ivfTopKHier(corpus: DataFrame, queries: DataFrame, k: Int,
                  quant: HierQuantizer, nProbe: Int = 4, probeTop: Int = 2,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding",
                  maxSubLiteralFloats: Long = SubLiteralMaxFloats)
  : DataFrame = {
    val indexed = assignCellsHier(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      quant, "nbr_vec", maxSubLiteralFloats)
    val probed = probeCellsHier(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      quant, "q_vec", probeTop, nProbe, maxSubLiteralFloats)
    val scored = indexed.join(probed, Seq("cell_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    topK(scored, k)
  }

  /** The top-level (neg_sim, cell_id) struct array for a
    * [[HierQuantizer]] — ALWAYS the single-literal HOF formulation,
    * never the ≤64 per-centroid codegen'd array: measured at sf10
    * (200k rows), the 40-way inlined literal projection runs ~185 µs/row
    * (the generated method trips the JIT's huge-method bailout and
    * drops to bytecode interpretation) vs ~55 µs/row for the
    * interpreted HOF pass over all 1600 cells — i.e. the "codegen"
    * path was ~130× slower per cosine at exactly the k1 this quantizer
    * targets (PLANS.md round 10, hierprofile2). The flat
    * [[assignCells]] is HOF-only too — the per-centroid codegen'd
    * literal projection is gone from the operator surface and survives
    * only as the SimilaritySpec equivalence witness. */
  private def topScoredExpr(quant: HierQuantizer, vecCol: String): Column = {
    val cents = typedLit(quant.top.map { case (i, c) => (i, c.toSeq) })
    transform(cents, c =>
      struct((lit(0.0) - cosine(col(vecCol), c.getField("_2"))).as("neg_sim"),
        c.getField("_1").as("cell_id")))
  }

  private def topCellExpr(quant: HierQuantizer, vecCol: String): Column =
    array_min(topScoredExpr(quant, vecCol)).getField("cell_id")

  private def subMapLit(quant: HierQuantizer): Column =
    typedLit(quant.sub.map { case (c1, scs) =>
      c1 -> scs.map { case (g, v) => (g, v.toSeq) }
    })

  /** Sub-centroid plan-size ceiling (r12 verdict item 1): below this
    * many total sub-centroid floats the sub level is folded into every
    * assignment/probe plan as ONE map literal (zero joins, measured
    * right at ≤16k cells × 64 dims ≈ 1M floats); ABOVE it the literal
    * becomes a driver/codegen killer — a real 100 TB index at 10⁵–10⁶
    * cells × 768+ dims would embed 0.3–6 GB in EVERY plan — so
    * [[assignCellsHier]] and the probes resolve the sub level through
    * a broadcast-joined (top cell → sub-centroids) table instead: the
    * data ships ONCE per job as torrent-broadcast blocks, never enters
    * the plan tree, codegen, or the driver's plan cache. The top level
    * is only √nCells centroids and stays a literal everywhere. The
    * default (4M floats ≈ 16 MB of vector data, 4× the largest
    * measured-good literal) keeps small-quantizer probe plans on the
    * zero-job literal path; both paths return bit-identical rows
    * (spec-pinned) — the switch is a plan-shape decision only.
    * Measured (Scratch `subjoinscale`, 200k-row assignment, local[8]):
    * the join path's per-cosine cost is FLAT in nCells (~0.08 µs —
    * 6.7/11.7/21.5/39.7 µs/row at 1k/4k/16k/64k cells, tracking the
    * k1+k2 cosine count exactly) while the literal's grows with the
    * plan payload (8.8/18.5/52.2/150.9 µs/row — 3.8× the join at 64k
    * cells), so corpus-scale ASSIGNMENT at ≥4k cells benefits from
    * forcing the join below the default ceiling; the ceiling protects
    * small QUERY batches, where the broadcast's fixed job overhead
    * would dominate. */
  val SubLiteralMaxFloats: Long = 4L << 20

  /** Cell-size plan-literal ceiling for the ADAPTIVE probe (r13 verdict
    * item 2, carried through r14): [[probeCellsHierAdaptive]] embeds one
    * long PER GLOBAL CELL ID as a dense array literal — O(nCells) bytes
    * in every adaptive plan, ~8 MB at 10⁶ cells, re-serialized with each
    * query batch's plan. Above this ceiling the same dense array rides a
    * broadcast VARIABLE and the prefix cut runs as one deterministic
    * per-row function — zero plan growth, still zero joins/shuffles;
    * below it the codegen'd literal path stays (it wins while the plan
    * payload is small — the [[SubLiteralMaxFloats]] crossover logic, one
    * level up). 64k longs ≈ 0.5 MB of plan, the same order as the
    * largest measured-good sub-centroid literal. */
  val SizeLiteralMaxLongs: Long = 64L << 10

  private[graft] def subLiteralFloats(quant: HierQuantizer): Long =
    quant.sub.valuesIterator
      .map(_.iterator.map(_._2.length.toLong).sum).sum

  /** The (top cell → sub-centroid array) side table of the broadcast
    * formulation — parallelize-backed (NOT a LocalRelation) so the
    * vectors live in RDD partitions and broadcast blocks, never in the
    * logical plan object graph a Catalyst rewrite would drag around.
    * Inner struct field names (_1, _2) match [[subMapLit]]'s tuple
    * encoding, so the downstream argmin/transform expressions are
    * IDENTICAL on both paths. */
  private def subTableDF(spark: org.apache.spark.sql.SparkSession,
                         quant: HierQuantizer): DataFrame = {
    import spark.implicits._
    val rows = quant.sub.toSeq.map { case (c1, scs) =>
      (c1, scs.map { case (g, v) => (g, v.toSeq) }) }
    val slices = math.max(1L,
      subLiteralFloats(quant) / (4L << 20)).toInt
    spark.sparkContext.parallelize(rows, slices).toDF("__c1", "__subs")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              trained: Option[Seq[(Int, Array[Float])]] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    // 1. train the coarse quantizer on (a sample of) the corpus — or
    // reuse a caller-trained model (the centroids are tiny and
    // deterministic; re-training per query batch is pure waste)
    val centroids = trained.getOrElse(trainCentroids(corpus, nCells, vecCol))

    // 2. assign every vector to its nearest centroid(s) — genuinely
    // narrow (see assignCells); the corpus is never shuffled to learn its
    // cell id (the round-1 window-argmax version shuffled |corpus|×nCells)
    val indexed = assignCells(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      centroids, "nbr_vec", 1)
    val probed = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      centroids, "q_vec", nProbe)

    // 3. candidates = corpus vectors in the probed cells; exact re-rank
    val scored = indexed.join(probed, Seq("cell_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    topK(scored, k)
  }

  /** Nearest-centroid cell assignment as a NARROW per-row expression: the
    * centroid set is tiny (nCells vectors) and is folded into the plan as
    * ONE literal array, scored with an interpreted HOF pass into
    * (−cosine, cell_id) structs, with the argmax taken by `array_min`
    * (struct ordering: highest similarity, ties to the lower cell id).
    * `topCells > 1` sorts and explodes the best cells (query-side
    * probing). No join, no window, no Exchange between the vector scan
    * and its cell id — asserted in SimilaritySpec; at 100 TB this is the
    * difference between a map over the corpus and a full-corpus ×nCells
    * shuffle.
    *
    * Why not one codegen'd CosineSim per centroid (the round-1..9
    * formulation for ≤64 cells)? Measured at sf10 (200k rows, dim 64):
    * the 40-centroid inlined projection ran ~185 µs/row — the generated
    * method exceeds the JIT's huge-method threshold, falls back to
    * bytecode interpretation, and lands ~130× SLOWER per cosine than
    * this single-literal HOF pass (~55 µs/row over 1600 cells, 0.27 s
    * over 160). The literal formulation survives as the equivalence
    * witness in SimilaritySpec (PLANS.md round 10, hierprofile2). */
  def assignCells(df: DataFrame, centroids: Seq[(Int, Array[Float])],
                  vecCol: String, topCells: Int): DataFrame = {
    val cents = typedLit(centroids.map { case (i, c) => (i, c.toSeq) })
    val scored = transform(cents, c =>
      struct((lit(0.0) - cosine(col(vecCol), c.getField("_2"))).as("neg_sim"),
        c.getField("_1").as("cell_id")))
    if (topCells == 1)
      df.withColumn("cell_id", array_min(scored).getField("cell_id"))
    else
      df.withColumn("cell_id",
        explode(slice(sort_array(scored), 1, topCells).getField("cell_id")))
  }

  /** Persist the IVF index: every corpus vector assigned to its cell and
    * written PARTITIONED BY cell_id — the layout claimed by the ivfTopK
    * design note, made real: at 100 TB a query scans only its probed
    * cells' files. */
  def writeIvfIndex(corpus: DataFrame, centroids: Seq[(Int, Array[Float])],
                    path: String, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit =
    assignCells(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      centroids, "nbr_vec", 1)
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)

  /** Append a batch to an existing [[writeIvfIndex]] layout — the ingest
    * half of continuous ANN (the IVF sibling of
    * `Dedup.appendToLshIndex`): new vectors take the same narrow
    * nearest-centroid assignment against the SAME frozen centroid set
    * (re-training would silently re-map existing cells; refresh the
    * quantizer by rewriting the index instead) and land as new files
    * inside their cell_id partition directories — probes see them on the
    * next read with no index rewrite and no shuffle of the existing
    * index. */
  def appendToIvfIndex(newVecs: DataFrame, centroids: Seq[(Int, Array[Float])],
                       path: String, idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit =
    assignCells(newVecs.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      centroids, "nbr_vec", 1)
      .write.mode("append").partitionBy("cell_id").parquet(path)

  /** Query a persisted IVF index with STATIC partition pruning: the
    * probed cell set (≤ |queries|·nProbe ints — tiny by the small-query
    * contract) folds into an `isin` partition filter, so the parquet scan
    * lists only those cell directories (PartitionFilters in the plan,
    * spec-asserted); candidates then re-rank through the bounded-heap
    * top-k. */
  def queryIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    centroids: Seq[(Int, Array[Float])], queries: DataFrame,
                    k: Int, nProbe: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probed = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      centroids, "q_vec", nProbe)
    val cells = probed.select("cell_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(path)
      .filter(col("cell_id").isin(cells: _*))
    val scored = index.join(broadcast(probed), Seq("cell_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    topK(scored, k)
  }

  // -----------------------------------------------------------------
  // IVF-PQ: coarse cells for pruning + PQ codes for payload
  // -----------------------------------------------------------------

  /** The FAISS-IVFPQ layout on parquet: every vector lands in its
    * nearest coarse cell's PARTITION (same pruning contract as
    * [[writeIvfIndex]]) but stores only its m PQ CODES — at dim 64 /
    * m 8 the index payload is 32× smaller than the raw-vector IVF
    * index, which at 100 TB of embeddings is the difference between
    * re-ranking from disk and re-ranking from page cache. Both
    * quantizers stay frozen for appends, exactly like
    * [[appendToIvfIndex]]. */
  def writeIvfPqIndex(corpus: DataFrame, centroids: Seq[(Int, Array[Float])],
                      cb: PqCodebooks, path: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit =
    assignCells(corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      centroids, "nbr_vec", 1)
      .select(col("nbr_id"), pqEncode(col("nbr_vec"), cb).as("codes"),
        col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(path)

  /** Append a batch to an existing [[writeIvfPqIndex]] layout — both
    * quantizers stay frozen (the coarse one as in [[appendToIvfIndex]];
    * re-training the PQ codebooks would silently re-code existing
    * rows, so refreshing either means rewriting the index). New codes
    * land as new files in their cell partitions; probes see them on
    * the next read with no rewrite and no shuffle of the index. */
  def appendToIvfPqIndex(newVecs: DataFrame,
                         centroids: Seq[(Int, Array[Float])],
                         cb: PqCodebooks, path: String,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit =
    assignCells(newVecs.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      centroids, "nbr_vec", 1)
      .select(col("nbr_id"), pqEncode(col("nbr_vec"), cb).as("codes"),
        col("cell_id"))
      .write.mode("append").partitionBy("cell_id").parquet(path)

  /** Query the IVF-PQ index: static partition pruning from the probed
    * cells (identical to [[queryIvfIndex]] — PartitionFilters in the
    * scan, spec-asserted), then asymmetric ADC re-rank against the
    * decoded codes. With nProbe = nCells the candidate set is the whole
    * corpus and the result is exactly [[pqTopK]]'s — gate q89 pins that
    * equivalence under q88's oracle. */
  def queryIvfPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      centroids: Seq[(Int, Array[Float])], cb: PqCodebooks,
                      queries: DataFrame, k: Int, nProbe: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val probed = assignCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      centroids, "q_vec", nProbe)
    val cells = probed.select("cell_id").distinct()
      .collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(path)
      .filter(col("cell_id").isin(cells: _*))
      // decode once per surviving index row, not per (row × probing
      // query) join pair — see pqTopK
      .withColumn("nbr_deq", pqDecode(col("codes"), cb))
    val scored = index.join(broadcast(probed), Seq("cell_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_deq")))
    topK(scored, k)
  }

  // -----------------------------------------------------------------
  // Versioned self-contained IVF index (quantizer refresh lifecycle)
  // -----------------------------------------------------------------

  /** Refresh the IVF index under `root` with a freshly trained
    * quantizer — the ANN twin of the OBO download lifecycle
    * (`OboRefresh`): re-training re-maps every cell id, so a refresh
    * can never append in place; instead each refresh writes a complete
    * new version directory `<root>/v<N>/{centroids, cells}` (the
    * centroids persist WITH the index, making it self-contained) and
    * COMMITS it by creating the `v<N>/_COMMITTED` marker last. Readers
    * resolve "current" as the highest committed version — there is no
    * pointer file to swap, so no rename/delete window exists anywhere:
    * a version is either invisible or complete. Old versions remain for
    * in-flight readers (prune them out of band).
    *
    * Concurrency: the version number comes from the directory LISTING
    * (max v* present + 1, committed or not), so a refresher that died
    * mid-write leaves an uncommitted garbage directory but never wedges
    * later refreshes. Two refreshers that list the same max race on the
    * `.claim` file created with overwrite=false; the loser fails fast.
    * That claim is truly atomic on HDFS-like filesystems; on
    * RawLocal/S3-style stores create-no-overwrite is check-then-create,
    * so run refreshes single-writer there (the commit-marker protocol
    * keeps READERS safe everywhere regardless).
    * @return the new version number */
  def refreshIvfIndex(corpus: DataFrame, nCells: Int, root: String,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      claim: ClaimPrimitive = CreateExclusiveClaim): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    val next = claimNextVersion(fs, rootPath, claim)
    val vdir = new org.apache.hadoop.fs.Path(rootPath, s"v$next")
    val centroids = trainCentroids(corpus, nCells, vecCol)
    centroids.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/v$next/centroids")
    writeIvfIndex(corpus, centroids, s"$root/v$next/cells", idCol, vecCol)
    // commit: the marker is the LAST write — readers never see less
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_COMMITTED"), false).close()
    next
  }

  /** The atomic CLAIM primitive behind every slot reservation in the
    * versioned-index lifecycle (version directories' `.claim`, the
    * tombstone `.seq=` markers): create a marker at `path` iff it does
    * not already exist, atomically with respect to concurrent
    * claimers of the SAME path. The default,
    * [[CreateExclusiveClaim]], is Hadoop `create(overwrite=false)` —
    * truly atomic on HDFS-like stores but CHECK-THEN-ACT on RawLocal
    * and S3A, where two racers can both think they won. Deployments
    * on object stores either run these writers single-process (the
    * documented fallback — the commit-marker-last protocol keeps
    * READERS safe regardless of writer races) or plug the store's
    * native conditional write through this trait: S3 `If-None-Match:
    * *` PUT, GCS `ifGenerationMatch=0`, ABFS `If-None-Match` — one
    * tiny adapter each, no lifecycle code changes (r12 verdict item
    * 5). Implementations must be side-effect-atomic; returning true
    * means the marker now exists and this caller created it. */
  trait ClaimPrimitive extends Serializable {
    def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
                 path: org.apache.hadoop.fs.Path): Boolean
  }

  /** Default claim: Hadoop create-exclusive (see [[ClaimPrimitive]]
    * for its object-store caveat and the conditional-write escape
    * hatch). */
  object CreateExclusiveClaim extends ClaimPrimitive {
    override def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
                          path: org.apache.hadoop.fs.Path): Boolean =
      try { fs.create(path, false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  /** Claim the next free version number under `rootPath` ATOMICALLY:
    * list → claim `v<n>/.claim` via the [[ClaimPrimitive]] → on
    * collision (a concurrent writer won that slot between the listing
    * and the claim) retry at the next number. Same CAS primitive as
    * the tombstone `.seq=` markers (r12): two concurrent refreshers /
    * compactors now both succeed in DISTINCT versions — the loser of
    * a slot race no longer fails — and readers are indifferent
    * (currentIvfVersion resolves the highest COMMITTED version, so
    * whichever writer commits last wins the cutover, the standard
    * last-writer-wins refresh semantics). The mkdirs of a lost slot is
    * idempotent junk inside the winner's own directory. */
  private def claimNextVersion(fs: org.apache.hadoop.fs.FileSystem,
                               rootPath: org.apache.hadoop.fs.Path,
                               claim: ClaimPrimitive = CreateExclusiveClaim)
  : Int = {
    var next = listIvfVersions(fs, rootPath).map(_._1).maxOption.getOrElse(0) + 1
    while (true) {
      val vdir = new org.apache.hadoop.fs.Path(rootPath, s"v$next")
      fs.mkdirs(vdir)
      if (claim.tryClaim(fs, new org.apache.hadoop.fs.Path(vdir, ".claim")))
        return next
      next += 1
    }
    next // unreachable
  }

  private def listIvfVersions(fs: org.apache.hadoop.fs.FileSystem,
                              rootPath: org.apache.hadoop.fs.Path)
  : Seq[(Int, Boolean)] = {
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .map { s =>
        (s.getPath.getName.drop(1).toInt,
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_COMMITTED")))
      }
  }

  /** The highest COMMITTED version under `root`, if any — uncommitted
    * (in-flight or abandoned) version directories are invisible. */
  def currentIvfVersion(spark: org.apache.spark.sql.SparkSession,
                        root: String): Option[Int] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listIvfVersions(fs, rootPath).collect { case (v, true) => v }.maxOption
  }

  /** Load the persisted quantizer of one index version. */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       root: String, version: Int): Seq[(Int, Array[Float])] = {
    import spark.implicits._
    spark.read.parquet(s"$root/v$version/centroids")
      .select("cell_id", "centroid").as[(Int, Seq[Float])]
      .collect().map { case (i, c) => (i, c.toArray) }.toSeq
  }

  /** Query the latest COMMITTED version of a versioned index: resolve
    * it once, load its centroids, probe with static partition pruning
    * ([[queryIvfIndex]]). Self-contained — callers hold no quantizer
    * state. */
  def queryVersionedIvfIndex(spark: org.apache.spark.sql.SparkSession,
                             root: String, queries: DataFrame, k: Int,
                             nProbe: Int, idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val centroids = readIvfCentroids(spark, root, v)
    queryIvfIndex(spark, s"$root/v$v/cells", centroids, queries, k, nProbe,
      idCol, vecCol)
  }

  /** Refresh a versioned IVF-PQ index: retrains BOTH quantizers (the
    * coarse cells and the per-subspace codebooks — either changing
    * invalidates existing rows, so a refresh always rewrites) and
    * publishes a complete self-contained version directory
    * `<root>/v<N>/{centroids, codebooks, cells}` under the same
    * claim-file CAS + commit-marker-last protocol as
    * [[refreshIvfIndex]]: concurrent refreshers race on the `.claim`
    * create(overwrite=false), a version is either invisible or
    * complete, old versions stay for in-flight readers. */
  def refreshIvfPqIndex(corpus: DataFrame, nCells: Int, dim: Int, m: Int,
                        kCodes: Int, root: String,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        claim: ClaimPrimitive = CreateExclusiveClaim): Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    val next = claimNextVersion(fs, rootPath, claim)
    val vdir = new org.apache.hadoop.fs.Path(rootPath, s"v$next")
    val centroids = trainCentroids(corpus, nCells, vecCol)
    val cb = pqTrain(corpus, dim, m, kCodes, vecCol)
    centroids.map { case (i, c) => (i, c.toSeq) }
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/v$next/centroids")
    cb.zipWithIndex.flatMap { case (words, s) =>
        words.zipWithIndex.map { case (w, j) => (s, j, w) }
      }.toDF("s", "j", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/v$next/codebooks")
    writeIvfPqIndex(corpus, centroids, cb, s"$root/v$next/cells", idCol, vecCol)
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_COMMITTED"), false).close()
    next
  }

  /** Load the persisted PQ codebooks of one index version. */
  def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                      root: String, version: Int): PqCodebooks = {
    import spark.implicits._
    spark.read.parquet(s"$root/v$version/codebooks")
      .select("s", "j", "codeword").as[(Int, Int, Seq[Double])]
      .collect().groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
  }

  /** Query the latest COMMITTED version of a versioned IVF-PQ index —
    * self-contained: resolves the version, loads both persisted
    * quantizers, probes with partition pruning + ADC re-rank. */
  def queryVersionedIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                               root: String, queries: DataFrame, k: Int,
                               nProbe: Int, idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val centroids = readIvfCentroids(spark, root, v)
    val cb = readPqCodebooks(spark, root, v)
    queryIvfPqIndex(spark, s"$root/v$v/cells", centroids, cb, queries, k,
      nProbe, idCol, vecCol)
  }

  // -----------------------------------------------------------------
  // The PRODUCTION index: two-level quantizer + bounded-sample PQ,
  // persisted and versioned — EVERY training and per-row term bounded
  // -----------------------------------------------------------------

  /** Bounded-sample PQ trainer over the same deterministic hash-rank
    * sample as [[trainCentroidsSampled]]. [[pqTrain]] fits m MLlib
    * k-means models over the FULL corpus — a rows × kCodes × m training
    * term that grows with the data exactly like the flat coarse
    * trainer's; at a fixed budget the codebooks train in constant time
    * regardless of corpus size (PQ codebooks saturate at a few thousand
    * representative vectors anyway — 256 codewords per subspace need
    * ~32 samples each). The Lloyd iterations run DRIVER-LOCALLY on the
    * collected sample: the input is model-sized BY CONSTRUCTION
    * (≤ budget × dim floats — the bounded-small-side collect
    * convention), and m distributed k-means fits on a few-KB sample are
    * pure job-scheduling overhead (measured: 16 MLlib fits cost ~60 s
    * of driver round-trips at gate scale vs sub-second local math;
    * PLANS.md round 10). Deterministic: the sample order is the
    * xxhash64 rank, seeds are the first k points per subspace, ties
    * never consult partitioning. */
  def pqTrainSampled(corpus: DataFrame, dim: Int, m: Int, k: Int,
                     sampleBudget: Int = 8192,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): PqCodebooks = {
    require(sampleBudget >= k,
      s"sampleBudget ($sampleBudget) must be >= kCodes ($k) — " +
        "per-subspace k-means needs at least one point per codeword")
    val dsub = dim / m
    val sample = corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(sampleBudget)
      .select(col(vecCol))
      .collect() // ≤ budget rows — the model's own training set
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (0 until m).map { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloydLocal(pts, k, iters = 10).map(_.toSeq).toSeq
    }
  }

  /** Plain in-process Lloyd (L2): seeds = the first k input points (the
    * caller fixes the order — hash rank upstream), empty clusters keep
    * their previous centroid. Used only on model-sized, bounded-budget
    * inputs; everything corpus-sized stays distributed. */
  private[graft] def lloydLocal(points: Array[Array[Double]], k: Int,
                                iters: Int): Array[Array[Double]] = {
    val n = points.length
    require(n > 0, "lloydLocal needs at least one point")
    val dim = points(0).length
    var cents = Array.tabulate(math.min(k, n))(i => points(i).clone())
    val assign = new Array[Int](n)
    for (_ <- 1 to iters) {
      val cs = cents // stable reference for the parallel closure
      // ASSIGNMENT — the n × k × dim term, ~all of the training cost —
      // is pure per point (reads points(i) and cs, writes slot i), so it
      // fans out over cores with a BYTE-IDENTICAL result: the winning
      // cluster per point does not depend on execution order. This is
      // the r14-verdict "days of single-core Lloyd at 10⁶ cells" term,
      // divided by the core count.
      parallelIndices(n, n.toLong * cs.length * dim) { i =>
        val p = points(i)
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cs.length) {
          val ce = cs(c); var d = 0.0; var j = 0
          while (j < dim) { val t = p(j) - ce(j); d += t * t; j += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        assign(i) = best
      }
      // ACCUMULATION — O(n·dim), negligible next to assignment — stays
      // sequential in point order: FP addition is order-sensitive and
      // the per-cluster sums must not change by a bit.
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      var i = 0
      while (i < n) {
        val p = points(i)
        val best = assign(i)
        counts(best) += 1
        val sb = sums(best); var j = 0
        while (j < dim) { sb(j) += p(j); j += 1 }
        i += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c)
        else { val s = sums(c); Array.tabulate(dim)(j => s(j) / counts(c)) }
      }
    }
    cents
  }

  /** Persist a [[HierQuantizer]] as one model-sized parquet: top rows
    * as (lvl=0, key=c1, cell_id=c1), sub rows as (lvl=1, key=c1,
    * cell_id=global). k2 rides every row (constant, but keeps the file
    * self-describing without a sidecar). */
  def writeHierQuantizer(spark: org.apache.spark.sql.SparkSession,
                         hq: HierQuantizer, path: String): Unit = {
    import spark.implicits._
    val rows =
      hq.top.map { case (c1, v) => (0, c1, c1, hq.k2, v.toSeq) } ++
        hq.sub.toSeq.flatMap { case (c1, scs) =>
          scs.map { case (g, v) => (1, c1, g, hq.k2, v.toSeq) }
        }
    rows.toDF("lvl", "key", "cell_id", "k2", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted [[HierQuantizer]] (inverse of
    * [[writeHierQuantizer]]) — model-sized collect. */
  def readHierQuantizer(spark: org.apache.spark.sql.SparkSession,
                        path: String): HierQuantizer = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("lvl", "key", "cell_id", "k2", "centroid")
      .as[(Int, Int, Int, Int, Seq[Float])].collect()
    val k2 = rows.head._4
    val top = rows.filter(_._1 == 0).sortBy(_._2)
      .map(r => (r._2, r._5.toArray)).toSeq
    val sub = rows.filter(_._1 == 1).groupBy(_._2).map { case (c1, rs) =>
      c1 -> rs.sortBy(_._3).map(r => (r._3, r._5.toArray)).toSeq
    }
    HierQuantizer(k2, top, sub)
  }

  /** Append a batch under a FROZEN [[HierQuantizer]] + codebooks —
    * the two-level sibling of [[appendToIvfPqIndex]]: ~2·√nCells
    * cosines per new row, new files land inside their cell_id
    * partition directories, no rewrite and no shuffle of the index. */
  def appendToIvfPqIndexHier(newVecs: DataFrame, hq: HierQuantizer,
                             cb: PqCodebooks, path: String,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): Unit =
    assignCellsHier(
      newVecs.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      hq, "nbr_vec")
      .select(col("nbr_id"), pqEncode(col("nbr_vec"), cb).as("codes"),
        col("cell_id"))
      .write.mode("append").partitionBy("cell_id").parquet(path)

  /** Query a persisted two-level IVF-PQ index: [[probeCellsHier]] ranks
    * probeTop top cells then their sub-centroids (probeTop × k2 cosines
    * per query, never nCells), the probed global cell ids fold into a
    * static `isin` partition filter (same pruning contract as
    * [[queryIvfIndex]], spec-asserted), candidates ADC re-rank through
    * the bounded-heap top-k. */
  def queryIvfPqIndexHier(spark: org.apache.spark.sql.SparkSession,
                          path: String, hq: HierQuantizer, cb: PqCodebooks,
                          queries: DataFrame, k: Int, nProbe: Int,
                          probeTop: Int = 2,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame =
    queryIvfPqIndexHierPaths(spark, Seq(path), hq, cb, queries, k, nProbe,
      probeTop, idCol, vecCol)

  /** Probe SEVERAL persisted two-level IVF-PQ roots as ONE index — the
    * refresh-built `v<N>/cells` layout plus any number of
    * streaming-ingest `batch=` roots
    * ([[graft.streaming.Streams.incrementalHierPqIngest]]): the probed
    * cell set folds into the SAME static `isin` partition filter on
    * EVERY root before the union (cell_id is a partition column in
    * both layouts — under the batch level in the ingest root — so each
    * scan lists only probed cell directories), then one ADC re-rank
    * over the unioned candidates. This is the 100 TB serving shape:
    * a rarely-retrained base index + continuously-streamed deltas,
    * probed together with no compaction step on the read path.
    *
    * The probe side joins SIZE-AWARE (r11 verdict item 1): the probe
    * row count is measured — queries.count() × nProbe, one cheap
    * aggregate with NO probe cosines — not assumed. A serving-sized
    * batch broadcasts behind the static cell filter (zero shuffle of
    * the index, only probed cell directories listed); a batch above
    * `maxBroadcastProbeRows` (a corpus-sized offline kNN-join, where
    * the probe side is queries × nProbe rows of (id, vector)) takes a
    * sort-merge join on `cell_id` instead — the shape that scales to
    * both sides being corpus-sized — and SKIPS the cell-set collect
    * entirely: a corpus-sized batch probes essentially every cell, so
    * the filter prunes nothing while its aggregate would cost a full
    * extra probe pass. Both plans return EXACTLY the same rows (same
    * candidates, same ADC scores, same deterministic topK tie-break)
    * — gate-pinned by q313. */
  def queryIvfPqIndexHierPaths(spark: org.apache.spark.sql.SparkSession,
                               paths: Seq[String], hq: HierQuantizer,
                               cb: PqCodebooks, queries: DataFrame, k: Int,
                               nProbe: Int, probeTop: Int = 2,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               tombstones: Option[DataFrame] = None,
                               maxBroadcastProbeRows: Long = 1L << 20,
                               maxSubLiteralFloats: Long =
                                 SubLiteralMaxFloats,
                               queryCountHint: Option[Long] = None)
  : DataFrame = {
    require(paths.nonEmpty, "need at least one index root")
    val probed = probeCellsHier(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      hq, "q_vec", probeTop, nProbe, maxSubLiteralFloats)
    // probe-side size WITHOUT a probe pass: the explode emits ≤ nProbe
    // rows per query, so queries.count() (no probe cosines in that
    // plan) bounds the probe rows tightly. For a bare scan that count
    // is ~free; a caller probing an EXPENSIVE derived query frame
    // passes `queryCountHint` (r12 verdict item 3) so the frame is
    // evaluated once by the probe itself, not a second time here — or
    // localCheckpoints the frame before calling.
    val nq = queryCountHint.getOrElse(queries.count())
    val broadcastProbe = nq * nProbe <= maxBroadcastProbeRows
    adcProbeTopK(spark, paths, probed, cb, k, tombstones, broadcastProbe)
  }

  /** The shared ADC tail of every hier-index probe: prune (serving
    * path only), union the roots, mask tombstones, decode, join the
    * probe side (broadcast vs merge per the caller's size decision),
    * re-rank through the bounded-heap top-k. `probed` must carry
    * (query_id, q_vec, cell_id). */
  private def adcProbeTopK(spark: org.apache.spark.sql.SparkSession,
                           paths: Seq[String], probed: DataFrame,
                           cb: PqCodebooks, k: Int,
                           tombstones: Option[DataFrame],
                           broadcastProbe: Boolean): DataFrame = {
    // serving path only: fold the probed cell set into a static
    // partition filter (one small-batch probe aggregate, ≤ nCells rows
    // collected). The merge path skips it — a corpus-sized batch
    // probes essentially every cell, and the collect would cost a full
    // extra probe pass for a filter that prunes nothing; the join on
    // cell_id does the matching.
    val cellFilter: Option[Seq[Int]] =
      if (broadcastProbe)
        Some(probed.select("cell_id").distinct()
          .collect().map(_.getInt(0)).toSeq)
      else None
    val live = paths.map { p =>
        val scan = spark.read.parquet(p)
        cellFilter.fold(scan)(cs => scan.filter(col("cell_id").isin(cs: _*)))
          .select(col("nbr_id"), col("codes"), col("cell_id"))
      }.reduce(_ unionByName _)
    // tombstone mask BEFORE the re-rank so a deleted row can't occupy
    // one of a query's k slots; the tombstone side is churn-bounded
    // (broadcast anti-join), absent entirely on the no-deletes path
    val index = tombstones.fold(live)(t =>
        live.join(broadcast(t.select(col("nbr_id")).distinct()),
          Seq("nbr_id"), "left_anti"))
      .withColumn("nbr_deq", pqDecode(col("codes"), cb))
    val joined =
      if (broadcastProbe)
        index.join(broadcast(probed), Seq("cell_id"))
      else // merge (not shuffle_hash): neither side need fit a task
        index.join(probed.hint("merge"), Seq("cell_id"))
    val scored = joined
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_deq")))
    topK(scored, k)
  }

  /** Refresh a versioned TWO-LEVEL IVF-PQ index — the 100 TB shape of
    * the ANN lifecycle, with every scale term bounded by construction:
    * coarse training is budget × √nCells ([[trainHierQuantizer]]), PQ
    * training is budget × kCodes × m ([[pqTrainSampled]]), per-row
    * assignment is ~2·√nCells cosines ([[assignCellsHier]]), the
    * payload is m bytes/row (PQ codes), and queries prune partitions
    * statically. Same claim-file CAS + commit-marker-last protocol as
    * [[refreshIvfIndex]] — a version is either invisible or complete;
    * the persisted quantizer + codebooks make every version
    * self-contained. Layout: `<root>/v<N>/{quantizer, codebooks,
    * cells}` (readers distinguish the hier layout by the `quantizer`
    * dir; [[currentIvfVersion]] works unchanged).
    * @return the new version number */
  def refreshIvfPqIndexHier(corpus: DataFrame, nCells: Int, dim: Int,
                            m: Int, kCodes: Int, root: String,
                            sampleBudget: Int = 8192,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding",
                            claim: ClaimPrimitive = CreateExclusiveClaim)
  : Int = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    val next = claimNextVersion(fs, rootPath, claim)
    val vdir = new org.apache.hadoop.fs.Path(rootPath, s"v$next")
    val hq = trainHierQuantizer(corpus, nCells, sampleBudget, idCol, vecCol)
    val cb = pqTrainSampled(corpus, dim, m, kCodes, sampleBudget, idCol, vecCol)
    writeHierQuantizer(spark, hq, s"$root/v$next/quantizer")
    cb.zipWithIndex.flatMap { case (words, s) =>
        words.zipWithIndex.map { case (w, j) => (s, j, w) }
      }.toDF("s", "j", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/v$next/codebooks")
    assignCellsHier(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec")),
      hq, "nbr_vec")
      .select(col("nbr_id"), pqEncode(col("nbr_vec"), cb).as("codes"),
        col("cell_id"))
      // one shuffle of the m-bytes/row code table so each cell directory
      // lands as ONE file — the bounded-file-count layout every probe
      // lists (cap per-file size with files.maxRecordsPerFile at scale)
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$root/v$next/cells")
    writeCellSizes(spark, s"$root/v$next/cells", s"$root/v$next/cellsizes")
    // The cumulative `folded` ledger survives a RETRAIN too (r12
    // ADVICE): compaction reads only the CURRENT version's ledger, so
    // a refresh publishing without it would reset recognition — a
    // still-live previously-folded batch dir (a predecessor that died
    // between commit and retirement, or a streaming replay recreating
    // a retired dir) would be treated as fresh and folded onto a base
    // that typically already contains its rows, permanent duplication.
    // The caller's corpus is the new truth of the index; whether it
    // kept or dropped those rows, re-folding the stale dir is wrong,
    // so the ledger rides forward byte-for-byte (like the quantizer
    // artifacts under compaction), written before `_COMMITTED`.
    currentIvfVersion(spark, root).foreach { cur =>
      val led = new org.apache.hadoop.fs.Path(s"$root/v$cur/folded")
      if (fs.exists(led))
        org.apache.hadoop.fs.FileUtil.copy(fs, led, fs,
          new org.apache.hadoop.fs.Path(s"$root/v$next/folded"), false, conf)
    }
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_COMMITTED"), false).close()
    next
  }

  /** Fold streamed `batch=` delta roots into the NEXT index version
    * WITHOUT retraining — the compaction leg of the streamed-index
    * lifecycle (r10 verdict item 2). At production micro-batch cadence
    * the probe's per-root listing + small-file cost grows with the
    * batch count; this bounds it: claim v(N+1), carry the CURRENT
    * version's quantizer + codebooks byte-for-byte (frozen — the codes
    * stay valid, so no row is re-encoded, only re-laid-out), write
    * `cells` as the union of v(N)'s cells and the folded deltas with
    * one file per cell (the fresh-refresh layout), commit, then retire
    * exactly the folded batch directories. Deltas that arrive AFTER
    * the fold listing keep their directories and stay probed alongside
    * the new version (`queryIvfPqIndexHierPaths` over
    * `Seq(v(N+1)/cells, ingestRoot deltas)`) — nothing is ever both
    * folded and retained, nothing unfolded is retired. Pass `batches`
    * to fold an explicit subset (also the spec hook pinning retirement
    * safety). Tombstones ([[deleteFromIvfPqIndexHier]]) ride a
    * STRICTER contract than batches (r11 ADVICE, resurrection fix):
    * the `del=` directories listed at fold start are applied
    * PHYSICALLY (their ids dropped from the new version's cells), but
    * they are retired ONLY when a re-listing of the ingest root AFTER
    * the folded batches were retired shows no `batch=` directory left
    * — an unfolded batch (explicit-subset fold, or a delta landing
    * between the fold listing and retirement) may still carry a
    * tombstoned row written before the delete, and retiring the
    * tombstone would resurrect it. Kept tombstones keep masking at
    * probe (already applied ones match nothing — the re-apply at the
    * next compaction is vacuous), so under continuous ingest the
    * `del=` set stays live until a quiescent compaction drains the
    * ingest root; its size is bounded by delete churn, never corpus.
    * Later tombstones (after the fold listing) keep masking at probe.
    * Returns (new version, folded batch ids); no deltas and no
    * tombstones → (current version, Nil) with no new version
    * published (tombstones alone DO publish — the physical-delete
    * pass). `midCompactionHook` runs after the fold/tombstone listing
    * and before the new version is written — the race-injection seam
    * (q315) proving a delta landing mid-compaction survives retirement,
    * stays probed, and cannot resurrect a tombstoned id.
    * Concurrency: same claim-CAS + commit-marker-last protocol as
    * [[refreshIvfPqIndexHier]]; the delta RETIRE runs only after the
    * commit marker, so a reader probing (current version + all deltas)
    * NEVER loses a row: before the commit it reads (old cells + every
    * delta) — each row once; in the commit→retire window a folded row
    * can surface twice (new cells AND its not-yet-retired delta dir),
    * a transient bounded artifact in which a duplicate pair may occupy
    * two of a query's k slots — callers needing exactly-k-distinct
    * through that window should `dropDuplicates(query_id, nbr_id)`
    * over a k+1 probe or probe the versioned root alone.
    *
    * DOUBLE-FOLD GUARD (the `v<n>/folded` manifest): a version's cells
    * may contain batches whose dirs are still live — the writer died
    * (or a racing compactor is still running) between its commit
    * marker and the retirement pass. Naively re-folding those batches
    * would union their rows onto a base that already holds them:
    * permanent duplication that no later compaction undoes. Every
    * publishing fold therefore writes the ids it folded as a manifest
    * artifact before its commit marker, and every compaction EXCLUDES
    * manifest-listed live batches from its union, completing their
    * retirement instead (when that leaves nothing fresh and no
    * tombstones, no version is published — the call just finishes the
    * predecessor's retirement and returns (cur, those ids)). Racing
    * compactors thus land in distinct versions (claim-CAS) and the
    * loser either publishes an equivalent fold, skips via the
    * manifest, or aborts cleanly mid-read when the winner retired a
    * listed batch first — its claimed version stays uncommitted (never
    * resolved by readers, reaped by [[pruneIvfVersions]]' grace
    * window). Schedule ONE compactor per root to avoid the wasted
    * work; correctness does not depend on it.
    *
    * BATCH-ID-REUSE GUARD (r12 ADVICE): ledger entries carry the
    * folded dir's id-set fingerprint (row count + bit_xor of
    * xxhash64(nbr_id)), and a ledger-listed LIVE dir is retired
    * without folding ONLY if its fingerprint still matches — a reused
    * batch id carrying genuinely new data (a reset streaming
    * checkpoint, a second query on the same ingest root; see
    * [[graft.streaming.Streams.incrementalHierPqIngest]]'s
    * checkpoint-continuity invariant) fails the compaction LOUDLY
    * before any write instead of being silently deleted. The check
    * costs one aggregate per inherited live dir (rare: crash recovery
    * or replay) over micro-batch-sized data. Pre-fingerprint ledgers
    * (r12) recognize by id alone — back-compat, documented weaker. */
  def compactIvfPqIndexHier(spark: org.apache.spark.sql.SparkSession,
                            root: String, ingestRoot: String,
                            batches: Option[Seq[Long]] = None,
                            midCompactionHook: () => Unit = () => (),
                            claim: ClaimPrimitive = CreateExclusiveClaim)
  : (Int, Seq[Long]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val ingestPath = new org.apache.hadoop.fs.Path(ingestRoot)
    val fs = rootPath.getFileSystem(conf)
    val cur = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val folded: Seq[Long] = batches.getOrElse {
      if (!fs.exists(ingestPath)) Nil
      else fs.listStatus(ingestPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong).sorted
    }
    // tombstones listed at fold start, same contract as batches: the
    // listed ones are applied PHYSICALLY to the new version and retired
    // after the commit; tombstones arriving after this listing keep
    // masking at probe until the next compaction
    val tombRoot = new org.apache.hadoop.fs.Path(root, "tombstones")
    val appliedTombs: Seq[Long] =
      if (!fs.exists(tombRoot)) Nil
      else fs.listStatus(tombRoot).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("del=")).map(_.stripPrefix("del=").toLong).sorted
    if (folded.isEmpty && appliedTombs.isEmpty) return (cur, Nil)
    // DOUBLE-FOLD GUARD: the current version's `folded` manifest is the
    // cumulative LEDGER of every batch id any ancestor fold absorbed —
    // rows the cells ALREADY contain. A listed batch dir that is still
    // (or again) live — a predecessor that committed and then crashed
    // before retiring it, a racer that commits while this listing runs,
    // or a streaming replay recreating a retired dir — must NOT be
    // folded again: its rows would union onto a base that already holds
    // them, permanent duplication. Ledger-listed live batches are
    // excluded from the union and their RETIREMENT is completed here
    // instead. The ledger carries FORWARD through every publish
    // (including tombstone-only ones), so recognition survives any
    // number of intervening versions; batch ids are monotonic and never
    // reused, so it grows by one long per batch ever folded.
    val curManifestPath = new org.apache.hadoop.fs.Path(s"$root/v$cur/folded")
    // ledger rows carry the folded dir's id-multiset FINGERPRINT
    // (cnt, fp = bit_xor of xxhash64(nbr_id), order-independent and
    // overflow-free; ids within one exactly-once batch dir are unique,
    // so pairwise-cancellation cannot blind it) alongside
    // the batch id (r12 ADVICE): retirement-completion deletes a
    // ledger-listed LIVE dir without folding it, which is only safe if
    // the dir holds the rows that were folded — batch dirs are named
    // by Structured Streaming's batchId, which restarts at 0 when a
    // checkpoint is reset or a new query writes to the same ingest
    // root, so a reused id could carry genuinely NEW data that a
    // by-id-only retirement would silently destroy. Pre-fingerprint
    // ledgers (null cnt/fp) fall back to by-id recognition.
    val ledgerStats: Map[Long, Option[(Long, Long)]] =
      if (!fs.exists(curManifestPath)) Map.empty
      else {
        val led = spark.read.parquet(curManifestPath.toString)
        val hasFp = led.columns.contains("cnt") && led.columns.contains("fp")
        val projected =
          if (hasFp) led.select(col("batch").cast("long"),
            col("cnt").cast("long"), col("fp").cast("long"))
          else led.select(col("batch").cast("long"),
            lit(null).cast("long").as("cnt"), lit(null).cast("long").as("fp"))
        projected.collect().map { r =>
          r.getLong(0) -> (if (r.isNullAt(1) || r.isNullAt(2)) None
                           else Some((r.getLong(1), r.getLong(2)))) }.toMap
      }
    val inheritedSet = ledgerStats.keySet
    val fresh = folded.filterNot(inheritedSet.contains)
    val inherited = folded.filter(inheritedSet.contains)
    // FAIL-FAST fingerprint check, before any write: an inherited dir
    // whose id multiset differs from what its ledger entry folded is a
    // reused batch id carrying new data (checkpoint-continuity
    // violation) — neither silently retiring it (permanent loss) nor
    // folding it (id-collision duplication) is acceptable, so refuse
    // loudly and leave the dir untouched; the operator must land that
    // data under a fresh batch id (or restore checkpoint continuity).
    inherited.foreach { b =>
      ledgerStats(b).foreach { case (cnt, fp) =>
        val d = spark.read
          .parquet(s"$ingestRoot/batch=$b")
          .agg(count(lit(1)).cast("long"), bit_xor(xxhash64(col("nbr_id"))))
          .head()
        val (liveCnt, liveFp) = (d.getLong(0), if (d.isNullAt(1)) 0L else d.getLong(1))
        if (liveCnt != cnt || liveFp != fp)
          throw new IllegalStateException(
            s"batch=$b under $ingestRoot was folded into a version with " +
            s"$cnt rows (fp=$fp) but the live dir now holds $liveCnt rows " +
            s"(fp=$liveFp): a reused batch id carrying new data — batch " +
            "ids must be monotonic and never reused (a reset streaming " +
            "checkpoint or a second query writing the same ingest root " +
            "violates this). Refusing to retire or fold it; move the new " +
            "data to a fresh batch id.")
      }
    }
    if (fresh.isEmpty && appliedTombs.isEmpty) {
      // nothing new to publish — complete the predecessor's unfinished
      // retirement (fingerprint-verified above) and keep serving the
      // current version
      inherited.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(ingestPath, s"batch=$b"), true)
      }
      return (cur, inherited)
    }
    midCompactionHook() // race-injection seam: a delta may land HERE
    val next = claimNextVersion(fs, rootPath, claim)
    val vdir = new org.apache.hadoop.fs.Path(rootPath, s"v$next")
    // frozen artifacts carried byte-for-byte — compaction never retrains
    Seq("quantizer", "codebooks").foreach { d =>
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$root/v$cur/$d"), fs,
        new org.apache.hadoop.fs.Path(s"$root/v$next/$d"), false, conf)
    }
    val base = spark.read.parquet(s"$root/v$cur/cells")
      .select("nbr_id", "codes", "cell_id")
    val merged =
      if (fresh.isEmpty) base
      else base.unionByName(spark.read.option("basePath", ingestRoot)
        .parquet(fresh.map(b => s"$ingestRoot/batch=$b"): _*)
        .select("nbr_id", "codes", "cell_id"))
    val physical =
      if (appliedTombs.isEmpty) merged
      else merged.join(broadcast(spark.read
          .parquet(appliedTombs.map(d => s"$root/tombstones/del=$d"): _*)
          .select(col("nbr_id")).distinct()),
        Seq("nbr_id"), "left_anti")
    physical
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$root/v$next/cells")
    writeCellSizes(spark, s"$root/v$next/cells", s"$root/v$next/cellsizes",
      preWrite = Some(physical))
    // the new version's ledger: everything the predecessor's ledger
    // held plus this fold — the double-fold guard's input for any
    // future compaction, whether THIS writer dies before retiring or a
    // replayed dir resurfaces versions later. Fresh entries carry the
    // id-multiset fingerprint (one aggregate over the just-read fresh
    // dirs — micro-batch-sized, never corpus); inherited entries keep
    // whatever the predecessor recorded.
    val freshStats: Map[Long, (Long, Long)] =
      if (fresh.isEmpty) Map.empty
      else spark.read.option("basePath", ingestRoot)
        .parquet(fresh.map(b => s"$ingestRoot/batch=$b"): _*)
        .groupBy(col("batch").cast("long").as("b"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          bit_xor(xxhash64(col("nbr_id"))).as("fp"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2))).toMap
    val ledgerRows: Seq[(Long, Option[Long], Option[Long])] =
      (ledgerStats.iterator.map { case (b, st) =>
        (b, st.map(_._1), st.map(_._2)) } ++
       fresh.iterator.map { b =>
         val (c, f) = freshStats.getOrElse(b, (0L, 0L))
         (b, Some(c): Option[Long], Some(f): Option[Long]) })
        .toSeq.sortBy(_._1)
    if (ledgerRows.nonEmpty) {
      import spark.implicits._
      ledgerRows.toDF("batch", "cnt", "fp").coalesce(1).write
        .mode("overwrite").parquet(s"$root/v$next/folded")
    }
    fs.create(new org.apache.hadoop.fs.Path(vdir, "_COMMITTED"), false).close()
    folded.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(ingestPath, s"batch=$b"), true)
    }
    // Tombstone retirement gate (r11 ADVICE high — resurrection fix):
    // an unfolded batch= dir surviving this compaction (explicit-subset
    // fold, or a delta landed after the fold listing) may hold a row
    // whose id a listed tombstone masks; the new version neither
    // dropped that row (the anti-join saw only base + folded) nor would
    // a retired tombstone keep masking it. So retire the listed del=
    // dirs ONLY when the post-retirement re-listing shows the ingest
    // root drained; otherwise they stay live — masking everywhere,
    // vacuously re-applied next compaction — until a fold catches up.
    val ingestDrained = !fs.exists(ingestPath) ||
      !fs.listStatus(ingestPath).exists(_.getPath.getName.startsWith("batch="))
    if (ingestDrained) appliedTombs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(tombRoot, s"del=$d"), true)
    }
    (next, folded)
  }

  /** DELETE rows from a versioned two-level IVF-PQ index by id — the
    * tombstone leg of the lifecycle (refresh / append / streamed
    * ingest / compact / prune / delete). Deleting in place would
    * rewrite cell files under live readers; instead the ids land as a
    * tombstone delta (`<root>/tombstones/del=<n>/`, one small file,
    * monotonic n like the ingest `batch=` convention), probes mask
    * them with one churn-bounded anti-join
    * ([[queryIvfPqIndexHierPaths]]' `tombstones` hook, applied
    * automatically by [[queryVersionedIvfPqIndexHier]] and
    * [[queryLiveIvfPqIndexHier]]; a RAW path-based
    * `queryIvfPqIndexHierPaths` call masks nothing unless the caller
    * passes `tombstones = readTombstoneIds(root)` — prefer the live
    * entry point for serving), and the next [[compactIvfPqIndexHier]]
    * applies them PHYSICALLY (rows dropped from the new version's
    * cells) then retires the listed tombstone directories once the
    * ingest root is drained (see its scaladoc — retiring earlier could
    * resurrect a tombstoned row still sitting in an unfolded delta).
    *
    * Concurrency (r11 ADVICE medium): the `del=<n>` slot is CLAIMED
    * atomically before the write — an empty `.seq=<n>` marker created
    * with overwrite=false (the same create-exclusive primitive as the
    * version dirs' `.claim`), retried at n+1 on collision — so two
    * concurrent deleters land in DISTINCT directories and neither id
    * set is clobbered. Markers outlive retirement, which keeps the
    * sequence monotonic across compactions (a retired number is never
    * reused); after a successful claim the deleter prunes markers
    * below its own, bounding the marker count by deleter concurrency,
    * not delete history.
    *
    * Semantics: a tombstone masks its id in EVERY root (base cells
    * and all ingest deltas) until retired — delete-by-id, not
    * delete-by-(id, batch). A row re-inserted under a still-live
    * tombstoned id stays invisible until compaction retires the
    * tombstone (and a re-insert folded by the SAME compaction that
    * applies the tombstone is dropped with the old copies): re-use of
    * a deleted id should wait for the delete to compact, or use a
    * fresh id. Scale shape: tombstone volume ∝ delete churn between
    * compactions — never corpus-sized; the anti-join broadcasts.
    * One narrow replay caveat: a streaming replay that recreates a
    * retired batch dir AFTER the tombstone masking its row was applied
    * and retired resurfaces that row to live probes until the next
    * compaction retires the dir again (the folded-ledger guard keeps
    * it out of every VERSION, so the exposure is probe-transient, never
    * durable) — a takedown that must hold through replays should
    * re-issue the delete after compaction, which is idempotent.
    * @return the tombstone sequence number */
  def deleteFromIvfPqIndexHier(spark: org.apache.spark.sql.SparkSession,
                               root: String, ids: DataFrame,
                               idCol: String = "vec_id",
                               claim: ClaimPrimitive = CreateExclusiveClaim)
  : Long = {
    // LOUD id validation (r12 verdict item 4): the tombstone ids are
    // matched against the index's long nbr_id, so a null id — or one
    // that nulls out under the cast (a fractional double truncates, a
    // non-numeric string throws on its own under ANSI) — would write a
    // null tombstone that matches NOTHING: a takedown that silently
    // no-ops is the worst failure mode a delete can have. One cheap
    // action on the churn-sized id frame, before any claim or write.
    val toWrite = ids.select(col(idCol).cast("long").as("nbr_id")).distinct()
      .localCheckpoint(true)
    // try/finally from the moment the checkpoint exists (r13 ADVICE):
    // a failing require below — or any claim/write error — must not
    // leave the checkpointed RDD pinned in executor storage for the
    // rest of the session
    try {
      val nullIds = toWrite.filter(col("nbr_id").isNull).count()
      require(nullIds == 0,
        s"deleteFromIvfPqIndexHier: $nullIds id(s) in '$idCol' are null " +
          "or null out under cast to long — the delete would silently " +
          "no-op for them; pass non-null integral ids")
      val conf = spark.sparkContext.hadoopConfiguration
      val tombRoot = new org.apache.hadoop.fs.Path(root, "tombstones")
      val fs = tombRoot.getFileSystem(conf)
      fs.mkdirs(tombRoot)
      def seqNumbers(): Seq[Long] = fs.listStatus(tombRoot).toSeq
        .map(_.getPath.getName)
        .collect {
          case n if n.startsWith("del=") => n.stripPrefix("del=").toLong
          case n if n.startsWith(".seq=") => n.stripPrefix(".seq=").toLong
        }
      // claim-CAS: the dot-prefixed marker is invisible to parquet
      // listings; the [[ClaimPrimitive]] is the atomic primitive
      // (create-exclusive by default), and a collision (concurrent
      // deleter won the slot) just moves to n+1
      var next = seqNumbers().maxOption.getOrElse(-1L) + 1L
      while (!claim.tryClaim(fs,
          new org.apache.hadoop.fs.Path(tombRoot, s".seq=$next")))
        next += 1L
      // prune markers below the claimed slot: monotonicity only needs the
      // MAX marker to survive retirement, and ours is ≥ every older one
      fs.listStatus(tombRoot).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".seq=") && n.stripPrefix(".seq=").toLong < next)
          fs.delete(st.getPath, false)
      }
      toWrite
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/tombstones/del=$next")
      next
    } finally Exec.releaseCheckpoint(toWrite)
  }

  /** The union of live tombstone ids under `root`, if any — one
    * (nbr_id) column; None when no tombstone directory exists (the
    * no-deletes fast path keeps probe plans anti-join-free).
    *
    * The id set is materialized EAGERLY (r11 ADVICE: one churn-bounded
    * collect into a local relation) so the returned frame carries no
    * reference to the retirable `del=` directories — a compaction
    * retiring them between plan construction and probe execution can
    * no longer fail the anti-join with a FileNotFoundException; the
    * probe sees the snapshot taken here, the same read-consistency
    * contract the commit-marker protocol gives the cells. */
  def readTombstoneIds(spark: org.apache.spark.sql.SparkSession,
                       root: String): Option[DataFrame] =
    readTombstoneIdsRetry(spark, root, attempts = 3)

  private def readTombstoneIdsRetry(spark: org.apache.spark.sql.SparkSession,
                                    root: String, attempts: Int)
  : Option[DataFrame] = {
    val tombRoot = new org.apache.hadoop.fs.Path(s"$root/tombstones")
    val fs = tombRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombRoot) ||
        !fs.listStatus(tombRoot).exists(_.getPath.getName.startsWith("del=")))
      None
    else {
      import spark.implicits._
      // a compaction may retire the del= dirs between the listing
      // above and this collect — that retirement means the tombstones
      // were just applied physically, so the correct answer is simply
      // the RE-READ state (usually None); a bounded retry closes the
      // window instead of failing the caller's probe (bounded, not
      // unconditional: a list-after-delete-inconsistent store could
      // otherwise spin on a stale listing forever)
      try {
        val ids = spark.read.parquet(s"$root/tombstones")
          .select(col("nbr_id").cast("long")).distinct()
          .as[Long].collect().toSeq
        Some(ids.toDF("nbr_id"))
      } catch {
        case _: java.io.FileNotFoundException if attempts > 1 =>
          readTombstoneIdsRetry(spark, root, attempts - 1)
        // match on the ERROR CLASS (r12 ADVICE: message substrings are
        // brittle across Spark versions/locales), with the legacy
        // message phrasings as back-compat fallback only
        case e: org.apache.spark.sql.AnalysisException if attempts > 1 && {
            val cond = Option(e.getCondition).getOrElse("")
            cond == "UNABLE_TO_INFER_SCHEMA" || cond == "PATH_NOT_FOUND" ||
            (cond.isEmpty &&
              (e.getMessage.contains("Unable to infer schema") ||
               e.getMessage.contains("Path does not exist")))
          } =>
          readTombstoneIdsRetry(spark, root, attempts - 1)
      }
    }
  }

  /** Query the latest COMMITTED version of a versioned two-level
    * IVF-PQ index — self-contained: resolves the version, loads the
    * persisted [[HierQuantizer]] + codebooks, probes with partition
    * pruning + ADC re-rank, and masks live tombstones
    * ([[deleteFromIvfPqIndexHier]]) automatically. */
  def queryVersionedIvfPqIndexHier(spark: org.apache.spark.sql.SparkSession,
                                   root: String, queries: DataFrame, k: Int,
                                   nProbe: Int, probeTop: Int = 2,
                                   idCol: String = "vec_id",
                                   vecCol: String = "embedding",
                                   maxBroadcastProbeRows: Long = 1L << 20,
                                   queryCountHint: Option[Long] = None)
  : DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val hq = readHierQuantizer(spark, s"$root/v$v/quantizer")
    val cb = readPqCodebooks(spark, root, v)
    queryIvfPqIndexHierPaths(spark, Seq(s"$root/v$v/cells"), hq, cb, queries,
      k, nProbe, probeTop, idCol, vecCol,
      tombstones = readTombstoneIds(spark, root),
      maxBroadcastProbeRows = maxBroadcastProbeRows,
      queryCountHint = queryCountHint)
  }

  /** The SERVING entry point over the full live index state — the
    * latest committed version PLUS every live streaming-ingest `batch=`
    * delta under `ingestRoot`, with live tombstones masked
    * automatically (r11 ADVICE: the raw path-based probe silently
    * skips masking unless the caller remembers the `tombstones` hook;
    * this wires it in, so the documented streamed-serving pattern —
    * [[graft.streaming.Streams.incrementalHierPqIngest]] deltas probed
    * beside a rarely-retrained base — honors deletes by default).
    * Self-contained like [[queryVersionedIvfPqIndexHier]]: resolves
    * the version, loads its frozen artifacts, lists the delta dirs,
    * probes everything as one index. */
  def queryLiveIvfPqIndexHier(spark: org.apache.spark.sql.SparkSession,
                              root: String, ingestRoot: String,
                              queries: DataFrame, k: Int,
                              nProbe: Int, probeTop: Int = 2,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding",
                              maxBroadcastProbeRows: Long = 1L << 20,
                              queryCountHint: Option[Long] = None)
  : DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val hq = readHierQuantizer(spark, s"$root/v$v/quantizer")
    val cb = readPqCodebooks(spark, root, v)
    val ingestPath = new org.apache.hadoop.fs.Path(ingestRoot)
    val fs = ingestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the ingest root rides as ONE path (batch=/cell_id= partition
    // discovery, the q308/q309 probe shape) — listing each batch dir
    // as its own root would cost a scan per micro-batch
    val hasDeltas = fs.exists(ingestPath) &&
      fs.listStatus(ingestPath).exists(_.getPath.getName.startsWith("batch="))
    val paths =
      if (hasDeltas) Seq(s"$root/v$v/cells", ingestRoot)
      else Seq(s"$root/v$v/cells")
    queryIvfPqIndexHierPaths(spark, paths, hq, cb,
      queries, k, nProbe, probeTop, idCol, vecCol,
      tombstones = readTombstoneIds(spark, root),
      maxBroadcastProbeRows = maxBroadcastProbeRows,
      queryCountHint = queryCountHint)
  }

  /** [[queryLiveIvfPqIndexHier]] with the ADAPTIVE probe — the last
    * cell of the serving matrix ({fixed, adaptive} × {versioned,
    * live}): per-query probe depth driven by cumulative candidate
    * count over the FULL live state. The size table is the base
    * version's persisted `cellsizes` artifact plus one recompute over
    * the live delta dirs (churn-bounded — compaction keeps the delta
    * count small), summed per cell: counts add, so the union table is
    * EXACTLY what [[indexCellSizes]] over (cells ∪ deltas) returns.
    * Tombstone masking wired in like the fixed live probe; masked
    * rows may slightly overcount a cell's size, which only deepens
    * the adaptive cut. */
  def queryLiveIvfPqIndexHierAdaptive(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ingestRoot: String, queries: DataFrame, k: Int, probeTop: Int = 4,
      candidateFactor: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBroadcastProbeRows: Long = 1L << 20,
      queryCountHint: Option[Long] = None): DataFrame = {
    val v = currentIvfVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed index version under $root"))
    val hq = readHierQuantizer(spark, s"$root/v$v/quantizer")
    val cb = readPqCodebooks(spark, root, v)
    val ingestPath = new org.apache.hadoop.fs.Path(ingestRoot)
    val fs = ingestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasDeltas = fs.exists(ingestPath) &&
      fs.listStatus(ingestPath).exists(_.getPath.getName.startsWith("batch="))
    val baseSizes = readCellSizes(spark, root, v)
    val (paths, sizes) =
      if (!hasDeltas) (Seq(s"$root/v$v/cells"), baseSizes)
      else (Seq(s"$root/v$v/cells", ingestRoot),
        baseSizes.unionByName(indexCellSizes(spark, Seq(ingestRoot)))
          .groupBy("cell_id").agg(sum(col("cnt")).as("cnt")))
    queryIvfPqIndexHierAdaptive(spark, paths, hq, cb, queries, k,
      probeTop, candidateFactor, Some(sizes), idCol, vecCol,
      tombstones = readTombstoneIds(spark, root),
      maxBroadcastProbeRows = maxBroadcastProbeRows,
      queryCountHint = queryCountHint)
  }

  /** EXACT-vector re-rank tier over an approximate candidate pool —
    * the serving-recall lever (r11 verdict item 3): ADC scores carry
    * the PQ quantization error, so the right way to raise recall@k is
    * not more probing but re-scoring a candidate pool of `poolK > k`
    * ADC survivors against the ORIGINAL vectors and re-cutting at k.
    * `candidates` needs only (query_id, nbr_id); both vector lookups
    * are equi-joins against the caller's corpus/query frames. Cost
    * shape: the pool is |queries| × poolK rows of two longs — at
    * serving size it broadcasts into the corpus scan (no corpus
    * shuffle; `broadcastCandidates = true`), and a corpus-sized
    * offline batch sets it false for plain shuffle equi-joins (every
    * side partitioned by the join key, nothing driver-sized). The
    * exact cosine and [[topK]] tie-break match [[bruteForceTopK]]
    * bit-for-bit, so a pool that contains the true top-k yields the
    * exact answer. */
  def exactRerank(candidates: DataFrame, corpus: DataFrame,
                  queries: DataFrame, k: Int,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  broadcastCandidates: Boolean = true): DataFrame = {
    val pairs = candidates.select(col("query_id"), col("nbr_id"))
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val withNbr =
      if (broadcastCandidates) c.join(broadcast(pairs), Seq("nbr_id"))
      else c.join(pairs.hint("merge"), Seq("nbr_id"))
    val scored =
      (if (broadcastCandidates) withNbr.join(broadcast(q), Seq("query_id"))
       else withNbr.join(q.hint("merge"), Seq("query_id")))
        .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    topK(scored, k)
  }

  /** [[queryVersionedIvfPqIndexHier]] with the exact re-rank tier
    * stacked on top: probe the committed version for an ADC pool of
    * `poolFactor`·k candidates (tombstones masked before the pool is
    * cut, so a deleted row can't hold a pool slot), then
    * [[exactRerank]] the pool against the caller's original-vector
    * corpus. Recall@10 gate-pinned ≥ 0.85 by q314 (vs the 0.25 ADC
    * floor) at ~poolFactor× the re-rank rows and unchanged probe
    * cost. */
  def queryVersionedIvfPqIndexHierRerank(
      spark: org.apache.spark.sql.SparkSession,
      root: String, corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, probeTop: Int = 2, poolFactor: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxBroadcastProbeRows: Long = 1L << 20,
      queryCountHint: Option[Long] = None): DataFrame = {
    require(poolFactor >= 1, s"poolFactor must be >= 1, got $poolFactor")
    val pool = queryVersionedIvfPqIndexHier(spark, root, queries,
      k * poolFactor, nProbe, probeTop, idCol, vecCol, maxBroadcastProbeRows,
      queryCountHint)
    // the rerank pool is ≤ |queries|·poolFactor·k pairs of two longs —
    // measured against the SAME cap as the probe side (one cheap
    // count — or the caller's queryCountHint, r12 verdict item 3 — no
    // probe cosines), not assumed broadcastable
    val poolBound = queryCountHint.getOrElse(queries.count()) *
      poolFactor * k
    exactRerank(pool, corpus, queries, k, idCol, vecCol,
      broadcastCandidates = poolBound <= maxBroadcastProbeRows)
  }

  /** The out-of-band pruner the version lifecycle points at: delete
    * index versions STRICTLY BELOW the latest committed one, keeping
    * the newest `keep` committed versions for in-flight readers.
    * COMMITTED versions below the cut are safe to delete once the
    * deployment's read-timeout grace has passed (readers resolve
    * "current" as the latest committed version, so only versions a
    * reader could have resolved strictly earlier go), exactly like any
    * snapshot vacuum. UNCOMMITTED directories below the cut are NOT
    * automatically dead: a slow refresher that claimed vN before a
    * faster one committed vN+1 sits below the cut while still writing
    * — deleting it mid-write would let its remaining writes recreate
    * the path and publish `_COMMITTED` on a torn directory that the
    * slow caller's returned version number points at. Such directories
    * are therefore removed only when their `.claim` is older than
    * `uncommittedGraceMs` (default 24 h — set it comfortably above the
    * longest plausible refresh; a claim that old with no commit marker
    * is an abandoned crash, not a writer). Returns the deleted version
    * numbers. */
  def pruneIvfVersions(spark: org.apache.spark.sql.SparkSession,
                       root: String, keep: Int = 1,
                       uncommittedGraceMs: Long = 24L * 3600 * 1000): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val conf = spark.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return Nil
    val versions = listIvfVersions(fs, rootPath)
    val committed = versions.collect { case (v, true) => v }.sorted
    if (committed.isEmpty) return Nil // never delete ahead of a commit
    val cut = committed.takeRight(keep).head
    val now = System.currentTimeMillis()
    def claimExpired(v: Int): Boolean = {
      val claim = new org.apache.hadoop.fs.Path(rootPath, s"v$v/.claim")
      try now - fs.getFileStatus(claim).getModificationTime >= uncommittedGraceMs
      catch { // no claim file at all: junk, not a live writer
        case _: java.io.FileNotFoundException => true
      }
    }
    val doomed = versions
      .filter { case (v, comm) => v < cut && (comm || claimExpired(v)) }
      .map(_._1).sorted
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(rootPath, s"v$v"), true)
    }
    doomed
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (the embedding
    * variant of Dedup): pairs in the same bucket with cosine ≥ threshold.
    * `hotBucketThreshold` is the same skew lever as the text-LSH joins —
    * a cluster of (near-)identical embeddings shares one hyperplane
    * bucket exactly like a viral document shares a band bucket. */
  def cosineNearDups(corpus: DataFrame, threshold: Double, nPlanes: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     hotBucketThreshold: Long = 0L, hotSalts: Int = 16): DataFrame = {
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
    Dedup.hotAwareSelfJoin(sig, Seq("bucket"),
        Seq(("id", "id_a", "id_b"), ("vec", "vec_a", "vec_b")),
        hotBucketThreshold, hotSalts)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .dropDuplicates("id_a", "id_b")
  }
}
