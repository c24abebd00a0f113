package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Vector-similarity operators: the codegen CosineSim expression against a
  * scala-computed reference, brute-force top-k ordering, LSH recall. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def cosineRef(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.zip(b).foreach { case (x, y) =>
      dot += x.toDouble * y.toDouble
      na += x.toDouble * x.toDouble; nb += y.toDouble * y.toDouble
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val rng = new scala.util.Random(7)
  private def vec(d: Int): Seq[Float] = Seq.fill(d)(rng.nextFloat() - 0.5f)

  test("CosineSim matches the reference computation exactly") {
    val rows = Seq.fill(20)((vec(16), vec(16)))
    val got = rows.toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).as[Double].collect()
    rows.zip(got).foreach { case ((a, b), g) =>
      assert(g == cosineRef(a, b), s"mismatch for $a x $b")
    }
  }

  test("CosineSim of a vector with itself is 1.0") {
    val v = vec(8)
    val got = Seq((v, v)).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("bruteForceTopK returns k neighbors ranked by descending cosine") {
    val corpus = (0L until 50L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
    val r = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(r.length == 10)
    r.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.sorted.reverse.toSeq == cs.toSeq) // descending
      assert(!rows.exists(r => r.getAs[Long]("nbr_id") == r.getAs[Long]("query_id")))
    }
  }

  test("sqStats fails fast on an empty corpus instead of an opaque NPE") {
    val empty = (0L until 4L).map(i => (i, vec(4))).toDF("vec_id", "embedding")
      .limit(0)
    val e = intercept[IllegalArgumentException] {
      Similarity.sqStats(empty, dim = 4)
    }
    assert(e.getMessage.contains("no non-null"))
  }

  test("SQ8 codes are bounded, decode within scale/2, encode stays narrow") {
    val corpus = (0L until 60L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.sqStats(corpus, dim = 12)
    assert(mins.zip(maxs).forall { case (a, b) => a <= b })
    val coded = corpus.select($"vec_id", $"embedding",
      Similarity.sqEncode($"embedding", mins, maxs).as("codes"),
      Similarity.sqDecode(
        Similarity.sqEncode($"embedding", mins, maxs), mins, maxs).as("deq"))
    val rows = coded.as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect()
    rows.foreach { case (id, emb, codes, deq) =>
      assert(codes.forall(c => c >= 0 && c <= 255), s"id $id codes $codes")
      emb.indices.foreach { i =>
        val scale = (maxs(i) - mins(i)) / 255.0
        assert(math.abs(deq(i) - emb(i)) <= scale / 2 + 1e-12,
          s"id $id dim $i: ${deq(i)} vs ${emb(i)}")
      }
    }
    // encode is a per-row expression: no Exchange between scan and codes
    val plan = corpus.select(Similarity.sqEncode($"embedding", mins, maxs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("SQ8 top-k agrees with brute force on separated clusters") {
    // two well-separated directions: quantization noise cannot flip
    // cluster membership, so top-1 must agree with exact search
    val base = vec(16)
    val other = base.map(-_)
    def jitter(v: Seq[Float], eps: Float): Seq[Float] =
      v.map(x => x + (rng.nextFloat() - 0.5f) * eps)
    val corpus = ((0L until 20L).map(i => (i, jitter(base, 0.05f))) ++
      (20L until 40L).map(i => (i, jitter(other, 0.05f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L || $"vec_id" === 25L)
    def top1(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.filter($"rank" === 1).select("query_id", "nbr_id")
        .as[(Long, Long)].collect().toMap
    val exact = top1(Similarity.bruteForceTopK(corpus, queries, 3))
    val sq = top1(Similarity.sqTopK(corpus, queries, 3, dim = 16))
    assert(sq.keySet == exact.keySet)
    // same-cluster guarantee: the sq top-1 lies in the query's cluster
    assert(sq(0L) < 20L && sq(25L) >= 20L)
    assert(exact == sq || sq.forall { case (q, n) =>
      (q < 20L) == (n < 20L) })
  }

  test("PQ encode picks the L2-argmin codeword; decode reconstructs it; " +
      "encode stays narrow") {
    val corpus = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooksFromRows(corpus, dim = 16, m = 4, k = 8)
    assert(cb.size == 4 && cb.forall(_.size == 8) &&
      cb.forall(_.forall(_.size == 4)))
    val rows = corpus.select($"vec_id", $"embedding",
      Similarity.pqEncode($"embedding", cb).as("codes"),
      Similarity.pqDecode(
        Similarity.pqEncode($"embedding", cb), cb).as("deq"))
      .as[(Long, Seq[Float], Seq[Int], Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.foreach { case (id, emb, codes, deq) =>
      assert(codes.size == 4 && deq.size == 16)
      val embD = emb.map(_.toDouble)
      codes.zipWithIndex.foreach { case (c, s) =>
        val sub = embD.slice(s * 4, s * 4 + 4)
        // driver-side argmin reference, ties to the lower index
        val want = cb(s).zipWithIndex
          .map { case (cw, j) => (l2(sub, cw), j) }.min._2
        assert(c == want, s"id $id subspace $s")
        assert(deq.slice(s * 4, s * 4 + 4) == cb(s)(c))
      }
    }
    val plan = corpus.select(Similarity.pqEncode($"embedding", cb))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("fused PqAssign kernel is value-identical to the compositional " +
      "L2Sq + array_min encode") {
    val corpus = (0L until 80L).map(i => (i, vec(24))).toDF("vec_id", "embedding")
    val cb = Similarity.pqCodebooksFromRows(corpus, dim = 24, m = 6, k = 8)
    val both = corpus.select(
      Similarity.pqEncode($"embedding", cb).as("fused"),
      Similarity.pqEncodeCompositional($"embedding", cb).as("comp"))
      .as[(Seq[Int], Seq[Int])].collect()
    both.foreach { case (f, c) => assert(f == c) }
  }

  test("PQ top-k agrees with brute force on separated clusters") {
    val base = vec(16)
    val other = base.map(-_)
    def jitter(v: Seq[Float], eps: Float): Seq[Float] =
      v.map(x => x + (rng.nextFloat() - 0.5f) * eps)
    val corpus = ((0L until 20L).map(i => (i, jitter(base, 0.05f))) ++
      (20L until 40L).map(i => (i, jitter(other, 0.05f))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L || $"vec_id" === 25L)
    // trained codebooks (k-means path) — both clusters get codewords,
    // so reconstructions keep cluster identity
    val cb = Similarity.pqTrain(corpus, dim = 16, m = 4, k = 4)
    val sq = Similarity.pqTopK(corpus, queries, 3, cb)
      .filter($"rank" === 1).select("query_id", "nbr_id")
      .as[(Long, Long)].collect().toMap
    assert(sq(0L) < 20L && sq(25L) >= 20L)
  }

  test("hyperplane signature is deterministic and similarity-sensitive") {
    val v = vec(16)
    val near = v.updated(0, v(0) + 0.001f)
    val df = Seq((1L, v), (2L, v), (3L, near)).toDF("vec_id", "embedding")
      .select($"vec_id", Similarity.hyperplaneSignature($"embedding", 16).as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L)) // identical input -> identical signature
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) <= 2) // tiny perturbation
  }

  test("LSH top-k finds the true nearest neighbor for duplicated vectors") {
    // plant exact duplicates so the true NN shares every bucket
    val base = (0L until 40L).map(i => (i, vec(12)))
    val dups = base.take(3).map { case (i, v) => (i + 100L, v) }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" >= 100L)
    val r = Similarity.lshTopK(corpus, queries, k = 1, nPlanes = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toMap
    assert(r == Map(100L -> 0L, 101L -> 1L, 102L -> 2L))
  }

  test("banded multi-table LSH: recall dominates single-table at equal " +
    "total bits, band duplicates collapse to one candidate, rank rows " +
    "stay unique") {
    val corpus = (0L until 120L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" % 30 === 0)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .select("query_id", "nbr_id")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("query_id", "nbr_id").intersect(exact).count()
    // same 60-bit signature budget: 1x60 single-table vs 15x4 banded
    val single = Similarity.lshTopK(corpus, queries, 5, nPlanes = 60)
    val banded = Similarity.lshTopK(corpus, queries, 5, nPlanes = 4,
      nTables = 15)
    assert(hits(banded) > hits(single),
      s"banded ${hits(banded)} should beat single-table ${hits(single)}")
    // each (query, rank) appears once: band collisions never duplicate
    val r = banded.groupBy("query_id", "nbr_id").count()
      .filter($"count" > 1).count()
    assert(r == 0L)
    // nTables = 1 keeps the original single-bucket plan: the join is on
    // the whole signature, no band column, no pre-join explode
    val plan1 = Similarity.lshTopK(corpus, queries, 5, nPlanes = 12)
      .queryExecution.optimizedPlan.toString
    assert(!plan1.contains("__t") && !plan1.contains("__sig"))
    // the banded construction computes the 60-bit signature ONCE per
    // side — the 15 band buckets derive from the projected __sig column,
    // never 15 signature evaluations per row (analyzed plan: the
    // optimizer folds this tiny LocalRelation away entirely)
    val planN = banded.queryExecution.analyzed.toString.toLowerCase
    val sigEvals = planN.sliding("hyperplanesig".length)
      .count(_ == "hyperplanesig")
    assert(sigEvals == 2, s"expected one signature eval per side, got " +
      s"$sigEvals:\n$planN")
  }

  test("semanticDedup: within-cell duplicates collapse to the min id, " +
    "cross-threshold neighbors survive, assignment stays narrow") {
    val base = (0L until 50L).map(i => (i, vec(12)))
    // plant two exact copies of doc 7 (same cell by construction) and a
    // mild perturbation of doc 3 that stays below the 0.999 threshold
    val v7 = base(7)._2
    val v3 = base(3)._2
    val nearMiss = v3.indices.map(i =>
      if (i % 2 == 0) v3(i) + 0.15f else v3(i) - 0.15f)
    val corpus = (base ++ Seq((100L, v7), (101L, v7), (102L, nearMiss)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.centroidsFromRows(corpus, nCells = 8)
    val kept = Similarity.semanticDedup(corpus, cents, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // the duplicate cluster {7, 100, 101} keeps only 7
    assert(kept.contains(7L) && !kept.contains(100L) && !kept.contains(101L))
    // the near-miss is not a semantic dup at this threshold
    assert(kept.contains(102L))
    assert(kept.size == corpus.count() - 2)
    // centroidsFromRows is the verbatim first rows
    assert(cents.map(_._1) == (0 until 8))
    assert(cents(7)._2.toSeq == v7)
  }

  test("semanticDedup: oversized-cell skew guard splits the hot cell " +
    "without losing planted duplicates; pathological cells hash-cap") {
    val base = (0L until 60L).map(i => (i, vec(12)))
    val v7 = base(7)._2
    val corpus = (base ++ Seq((100L, v7), (101L, v7)))
      .toDF("vec_id", "embedding")
    // ONE centroid → every row lands in one cell of 62 rows, far above
    // the 8-row cap: the guard must sub-centroid-split it. Exact dups
    // share a vector, so nearest-sub-centroid keeps them co-celled and
    // the collapse result is IDENTICAL to the unguarded run.
    val cents = Similarity.centroidsFromRows(corpus, nCells = 1)
    val unguarded = Similarity.semanticDedup(corpus, cents,
        threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    val guarded = Similarity.semanticDedup(corpus, cents,
        threshold = 0.999, maxCellSize = 8)
      .select("vec_id").as[Long].collect().toSet
    assert(guarded == unguarded)
    assert(guarded.contains(7L) && !guarded.contains(100L) &&
      !guarded.contains(101L))
    // A cell of ALL-IDENTICAL vectors can't be split semantically (every
    // member is nearest to the same sub-centroid) — the depth-exhausted
    // hash cap must still bound it and terminate; the cost is a bounded
    // recall loss (one survivor PER SLICE instead of one overall).
    val same = (0L until 30L).map(i => (i, base(0)._2))
      .toDF("vec_id", "embedding")
    val sameCents = Similarity.centroidsFromRows(same, nCells = 1)
    val survivors = Similarity.semanticDedup(same, sameCents,
        threshold = 0.999, maxCellSize = 5, maxSplitDepth = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors.contains(0L)) // global min id always survives
    // every final slice holds <= 5 rows (the hard cap), so at least
    // ceil(30/5) = 6 slices exist; re-counted re-slicing of overshooting
    // slices can push the count somewhat above the first round's
    // 2*ceil(30/5) = 12 slices, but never near the corpus size
    assert(survivors.size >= 6 && survivors.size <= 24,
      s"hash cap should leave one survivor per <=5-row slice, got " +
        s"${survivors.size}")
  }

  test("capCells: the cap is a hard guarantee (post-round re-counts), " +
    "md5 face matches xxhash face's grouping bound, and an exhausted " +
    "round budget fails fast instead of returning an uncapped cell") {
    val v = vec(8)
    val assigned = (0L until 40L).map(i => ("0", i, v))
      .toDF("__cell", "__id", "__vec")
    // cap 3 over 40 identical rows, no sub-centroid rounds: the first
    // hash round's 28 slices of mean size ~1.4 can still overshoot 3 —
    // the re-count loop must keep slicing until NO cell exceeds the cap
    for (md5Face <- Seq(false, true)) {
      val capped = Similarity.capCells(assigned, maxCellSize = 3,
        maxSplitDepth = 0, maxCapRounds = 16, md5CapHash = md5Face)
      val sizes = capped.groupBy("__cell").count()
        .select("count").as[Long].collect()
      assert(sizes.nonEmpty && sizes.max <= 3L,
        s"md5Face=$md5Face left a cell of ${sizes.max} > cap 3")
      assert(sizes.sum == 40L) // no row lost or duplicated by capping
    }
    // zero rounds + an oversized cell = the guard cannot deliver its
    // contract: it must throw, never silently pass the cell through
    val e = intercept[IllegalArgumentException] {
      Similarity.capCells(assigned, maxCellSize = 3, maxSplitDepth = 0,
        maxCapRounds = 0)
    }
    assert(e.getMessage.contains("cap"))
  }

  test("cosineNearDups surfaces planted duplicates") {
    val base = (0L until 30L).map(i => (i, vec(12)))
    val corpus = (base :+ ((99L, base(4)._2))).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDups(corpus, threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((4L, 99L)))
    // skew lever: hot-bucket salted join is result-identical
    val salted = Similarity.cosineNearDups(corpus, threshold = 0.999,
        hotBucketThreshold = 1L, hotSalts = 4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(salted == pairs)
  }

  test("IVF top-k finds planted duplicates and agrees with brute force on top-1") {
    val base = (0L until 60L).map(i => (i, vec(12)))
    val dups = base.take(3).map { case (i, v) => (i + 100L, v) }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" >= 100L)
    val r = Similarity.ivfTopK(corpus, queries, k = 1, nCells = 4, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toMap
    // an exact duplicate lands in the same k-means cell as its twin
    assert(r == Map(100L -> 0L, 101L -> 1L, 102L -> 2L))
  }

  test("bounded-sample quantizer training is deterministic and still separates planted twins") {
    val base = (0L until 120L).map(i => (i, vec(12)))
    val dups = base.take(3).map { case (i, v) => (i + 500L, v) }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    // budget strictly below the corpus size: the sample genuinely bounds
    val c1 = Similarity.trainCentroidsSampled(corpus, nCells = 4, sampleBudget = 48)
    val c2 = Similarity.trainCentroidsSampled(corpus, nCells = 4, sampleBudget = 48)
    assert(c1.map { case (i, v) => (i, v.toSeq) } ==
      c2.map { case (i, v) => (i, v.toSeq) },
      "hash-rank sample + seeded k-means must be run-to-run deterministic")
    assert(c1.size == 4 && c1.forall(_._2.length == 12))
    // the sampled quantizer still co-cells exact twins: IVF over it
    // returns each planted duplicate's twin as top-1
    val queries = corpus.filter($"vec_id" >= 500L)
    val r = Similarity.ivfTopK(corpus, queries, k = 1, nCells = 4, nProbe = 2,
        trained = Some(c1))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toMap
    assert(r == Map(500L -> 0L, 501L -> 1L, 502L -> 2L))
    // budget below nCells must fail fast, not produce a degenerate model
    val e = intercept[IllegalArgumentException] {
      Similarity.trainCentroidsSampled(corpus, nCells = 8, sampleBudget = 4)
    }
    assert(e.getMessage.contains("sampleBudget"))
  }

  test("two-level quantizer: deterministic, narrow assignment, twins co-celled, dedup drops the dup") {
    import org.apache.spark.sql.functions._
    val base = (0L until 120L).map(i => (i, vec(12)))
    val dups = base.take(3).map { case (i, v) => (i + 500L, v) }
    val corpus = (base ++ dups).toDF("vec_id", "embedding")
    val q1 = Similarity.trainHierQuantizer(corpus, nCells = 9, sampleBudget = 64)
    val q2 = Similarity.trainHierQuantizer(corpus, nCells = 9, sampleBudget = 64)
    assert(q1.k2 == q2.k2 && q1.top.map { case (i, v) => (i, v.toSeq) } ==
      q2.top.map { case (i, v) => (i, v.toSeq) } &&
      q1.sub.view.mapValues(_.map { case (g, v) => (g, v.toSeq) }).toMap ==
      q2.sub.view.mapValues(_.map { case (g, v) => (g, v.toSeq) }).toMap,
      "hash-rank sample + seeded top fit + hash-seeded subs must be deterministic")
    assert(q1.nCells <= 9 + q1.k2, s"cell budget blown: ${q1.nCells}")
    // assignment is narrow: no Exchange between the scan and cell_id
    val assigned = Similarity.assignCellsHier(
      corpus.select($"vec_id".as("__id"), $"embedding".as("__vec")), q1, "__vec")
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hier assignment shuffled:\n$plan")
    // an exact twin is assigned the same global cell as its original
    val cells = assigned.collect()
      .map(r => r.getAs[Long]("__id") -> r.getAs[Int]("cell_id")).toMap
    (0 until 3).foreach { i =>
      assert(cells(i.toLong) == cells(i + 500L),
        s"twin $i split across cells: ${cells(i.toLong)} vs ${cells(i + 500L)}")
    }
    // IVF over the two-level quantizer returns each twin as top-1
    val r = Similarity.ivfTopKHier(corpus,
        corpus.filter($"vec_id" >= 500L), k = 1, q1, nProbe = 2, probeTop = 2)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"))).toMap
    assert(r == Map(500L -> 0L, 501L -> 1L, 502L -> 2L))
    // SemDeDup over the two-level quantizer removes the planted dups
    val kept = Similarity.semanticDedupHier(corpus, q1, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(Set(500L, 501L, 502L).forall(d => !kept.contains(d)),
      s"planted exact dups survived: ${kept.intersect(Set(500L, 501L, 502L))}")
    assert((0L until 3L).forall(kept.contains),
      "min-id survivors must be kept")
  }

  test("probeCellsHier keeps fallback-assigned rows reachable (sub-less top cell)") {
    import org.apache.spark.sql.functions._
    // two orthogonal top cells; cell 1 has NO sub entry, so rows
    // nearest it are fallback-assigned to global id 1·k2 = 2 — the
    // probe must surface that cell (scored by the top-level
    // similarity), not filter it out (ADVICE round 10)
    val hq = Similarity.HierQuantizer(k2 = 2,
      top = Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(0f, 1f, 0f, 0f))),
      sub = Map(0 -> Seq((0, Array(1f, 0f, 0f, 0f)),
        (1, Array(0.9f, 0.1f, 0f, 0f)))))
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f)),
      (3L, Seq(0.1f, 0.99f, 0f, 0f))).toDF("vec_id", "embedding")
    val cellsOf = Similarity.assignCellsHier(
        corpus.select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .collect().map(r => r.getAs[Long]("nbr_id") -> r.getAs[Int]("cell_id"))
      .toMap
    assert(cellsOf(2L) == 2 && cellsOf(3L) == 2,
      s"rows nearest the sub-less top cell must take the fallback id: $cellsOf")
    // a query pointing straight at the sub-less top cell still probes
    // the fallback cell (pre-fix: candidate array empty, query dropped)
    val queries = Seq((9L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val probedCells = Similarity.probeCellsHier(
        queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec")),
        hq, "q_vec", probeTop = 1, nProbe = 2)
      .select("cell_id").as[Int].collect().toSet
    assert(probedCells.contains(2), s"fallback cell unreachable: $probedCells")
    // end-to-end: the query returns its true neighbors, not zero rows
    val got = Similarity.ivfTopKHier(corpus, queries, k = 2, hq,
        nProbe = 2, probeTop = 1)
      .select("nbr_id").as[Long].collect().toSet
    assert(got == Set(2L, 3L), s"query lost its fallback-cell neighbors: $got")
  }

  test("bounded-heap top-k matches the window formulation and aggregates partially") {
    import org.apache.spark.sql.functions._
    val corpus = (0L until 200L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 5)
    val heap = Similarity.bruteForceTopK(corpus, queries, k = 7)
    // the round-1 window formulation as the reference semantics
    val c = corpus.select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec"))
    val q = queries.select($"vec_id".as("query_id"), $"embedding".as("q_vec"))
    val scored = c.crossJoin(q).filter($"query_id" =!= $"nbr_id")
      .withColumn("cos", Similarity.cosine($"q_vec", $"nbr_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy($"cos".desc, $"nbr_id".asc)
    val win = scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 7).select("query_id", "nbr_id", "cos", "rank")
    def set(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(set(heap) == set(win))
    // map-side truncation: a partial aggregate runs before the exchange
    val plan = heap.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("partial"), s"no partial aggregation in:\n$plan")
  }

  test("IVF cell assignment is narrow: no Exchange between scan and cell_id") {
    // round-1 regression: the window-argmax assignment shuffled the whole
    // corpus ×nCells; the literal-centroid argmax must stay map-only
    val corpus = (0L until 50L).map(i => (i, vec(8))).toDF("vec_id", "embedding")
    val cents = Seq(0 -> Array.fill(8)(0.5f), 1 -> Array.fill(8)(-0.5f))
    for (topCells <- Seq(1, 2)) {
      val assigned = Similarity.assignCells(
        corpus.select($"vec_id".as("id"), $"embedding".as("v")), cents, "v", topCells)
      val plan = assigned.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"topCells=$topCells plan:\n$plan")
      // and the assignment itself is correct: nearest centroid first
      val cells = assigned.groupBy("cell_id").count().collect()
      assert(cells.map(_.getAs[Int]("cell_id")).toSet.subsetOf(Set(0, 1)))
    }
    // argmax agrees with an explicit per-row cosine comparison
    val one = Similarity.assignCells(
      Seq((7L, Array.fill(8)(0.4f))).toDF("id", "v"), cents, "v", 1)
      .select("cell_id").as[Int].head()
    assert(one == 0)
  }

  test("persisted IVF index prunes to the probed cell partitions") {
    val base = (0L until 60L).map(i => (i, vec(12)))
    val corpus = (base ++ base.take(2).map { case (i, v) => (i + 100L, v) })
      .toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(12)(d => math.cos(i * 12 + d + 1).toFloat))
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/idx"
    Similarity.writeIvfIndex(corpus, cents, dir)
    // partitioned layout on disk
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("cell_id=")))
    val queries = corpus.filter($"vec_id" >= 100L)
    val r = Similarity.queryIvfIndex(spark, dir, cents, queries, k = 1, nProbe = 1)
    // planted duplicates land in their twin's cell -> found at top-1
    val top = r.collect().map(x => (x.getAs[Long]("query_id"), x.getAs[Long]("nbr_id"))).toMap
    assert(top == Map(100L -> 0L, 101L -> 1L))
    // the scan carries a cell_id partition filter (static pruning)
    val plan = Similarity.queryIvfIndex(spark, dir, cents, queries, 1, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_id"),
      s"expected partition pruning in:\n$plan")
  }

  test("IVF-PQ index stores codes, prunes partitions, and at full probe " +
      "equals direct pqTopK") {
    val corpus = (0L until 50L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(16)(d => math.cos(i * 16 + d + 1).toFloat))
    val cb = Similarity.pqCodebooksFromRows(corpus, dim = 16, m = 4, k = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/idx"
    Similarity.writeIvfPqIndex(corpus, cents, cb, dir)
    // partitioned layout holding codes, not vectors
    val idx = spark.read.parquet(dir)
    assert(idx.columns.toSet == Set("nbr_id", "codes", "cell_id"))
    val queries = corpus.filter($"vec_id" < 3)
    // static partition pruning survives the codes payload
    val plan = Similarity
      .queryIvfPqIndex(spark, dir, cents, cb, queries, k = 2, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_id"),
      s"expected partition pruning in:\n$plan")
    // full probe == direct PQ scoring, row for row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "cos", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val viaIndex = rows(Similarity
      .queryIvfPqIndex(spark, dir, cents, cb, queries, k = 4, nProbe = 4))
    val direct = rows(Similarity.pqTopK(corpus, queries, 4, cb))
    assert(viaIndex == direct)
  }

  test("appendToIvfPqIndex: appended batch ≡ rebuilding the index whole") {
    val a = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val b = (100L until 120L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(16)(d => math.cos(i * 16 + d + 1).toFloat))
    val cb = Similarity.pqCodebooksFromRows(a, dim = 16, m = 4, k = 8)
    val incDir = java.nio.file.Files.createTempDirectory("ivfpqi").toString + "/idx"
    val allDir = java.nio.file.Files.createTempDirectory("ivfpqa").toString + "/idx"
    Similarity.writeIvfPqIndex(a, cents, cb, incDir)
    Similarity.appendToIvfPqIndex(b, cents, cb, incDir)
    Similarity.writeIvfPqIndex(a.unionByName(b), cents, cb, allDir)
    def all(dir: String) = spark.read.parquet(dir)
      .select("nbr_id", "codes", "cell_id")
      .as[(Long, Seq[Int], Int)].collect().toSet
    assert(all(incDir) == all(allDir))
  }

  test("appendToIvfIndex: appended batch ≡ rebuilding the index whole") {
    val a = (0L until 40L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val b = (100L until 120L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val cents = (0 until 4).map(i =>
      i -> Array.tabulate(12)(d => math.cos(i * 12 + d + 1).toFloat))
    val incDir = java.nio.file.Files.createTempDirectory("ivfi").toString + "/idx"
    val allDir = java.nio.file.Files.createTempDirectory("ivfa").toString + "/idx"
    Similarity.writeIvfIndex(a, cents, incDir)
    Similarity.appendToIvfIndex(b, cents, incDir)
    Similarity.writeIvfIndex(a.unionByName(b), cents, allDir)
    def canon(p: String) = spark.read.parquet(p)
      .select($"nbr_id", $"cell_id").as[(Long, Int)].collect().sorted.toSeq
    assert(canon(incDir) == canon(allDir))
    // probes against the appended index see the new batch
    val q = b.limit(3)
    val inc = Similarity.queryIvfIndex(spark, incDir, cents, q, k = 1, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")))
    val whole = Similarity.queryIvfIndex(spark, allDir, cents, q, k = 1, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id")))
    assert(inc.sorted.toSeq == whole.sorted.toSeq)
  }

  test("versioned IVF index: refresh trains, cuts over atomically, and " +
       "queries are self-contained") {
    val a = (0L until 40L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val b = (100L until 110L).map(i => (i, vec(12))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("vivf").toString + "/idx"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    assert(Similarity.currentIvfVersion(spark, root).isEmpty)
    val v1 = Similarity.refreshIvfIndex(a, nCells = 3, root)
    assert(v1 == 1 && Similarity.currentIvfVersion(spark, root).contains(1))
    // self-contained query: no caller-held centroids
    val q = a.limit(2)
    assert(Similarity.queryVersionedIvfIndex(spark, root, q,
      k = 1, nProbe = 3).count() == 2L)
    // refresh over a grown corpus: new version, pointer cut over, old
    // version directory still present for in-flight readers
    val v2 = Similarity.refreshIvfIndex(a.unionByName(b), nCells = 3, root)
    assert(v2 == 2 && Similarity.currentIvfVersion(spark, root).contains(2))
    assert(new java.io.File(s"$root/v1/cells").exists())
    val r = Similarity.queryVersionedIvfIndex(spark, root,
      b.limit(2), k = 1, nProbe = 3)
    assert(r.count() == 2L)
    // the persisted quantizer round-trips exactly
    val cents = Similarity.readIvfCentroids(spark, root, v2)
    assert(cents.size == 3 && cents.forall(_._2.length == 12))
    // an ABANDONED (claimed, never committed) v3 from a dead refresher:
    // readers never see it, and the next refresh skips past it instead
    // of wedging on the stale claim
    val stale = new java.io.File(s"$root/v3")
    stale.mkdirs()
    assert(new java.io.File(stale, ".claim").createNewFile())
    assert(Similarity.currentIvfVersion(spark, root).contains(2))
    val v4 = Similarity.refreshIvfIndex(a, nCells = 3, root)
    assert(v4 == 4 && Similarity.currentIvfVersion(spark, root).contains(4))
  }

  test("versioned IVF-PQ index: refresh retrains both quantizers, cuts " +
       "over atomically, queries are self-contained") {
    val a = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val b = (100L until 110L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("vivfpq").toString + "/idx"
    assert(Similarity.currentIvfVersion(spark, root).isEmpty)
    val v1 = Similarity.refreshIvfPqIndex(a, nCells = 3, dim = 16, m = 4,
      kCodes = 4, root)
    assert(v1 == 1 && Similarity.currentIvfVersion(spark, root).contains(1))
    assert(Similarity.queryVersionedIvfPqIndex(spark, root, a.limit(2),
      k = 1, nProbe = 3).count() == 2L)
    // refresh over a grown corpus: new version, old dir stays readable
    val v2 = Similarity.refreshIvfPqIndex(a.unionByName(b), nCells = 3,
      dim = 16, m = 4, kCodes = 4, root)
    assert(v2 == 2 && Similarity.currentIvfVersion(spark, root).contains(2))
    assert(new java.io.File(s"$root/v1/cells").exists())
    assert(Similarity.queryVersionedIvfPqIndex(spark, root, b.limit(2),
      k = 1, nProbe = 3).count() == 2L)
    // both persisted quantizers round-trip with the right shapes
    val cents = Similarity.readIvfCentroids(spark, root, v2)
    assert(cents.size == 3 && cents.forall(_._2.length == 16))
    val cb = Similarity.readPqCodebooks(spark, root, v2)
    assert(cb.size == 4 && cb.forall(_.size == 4) &&
      cb.forall(_.forall(_.size == 4)))
  }

  test("versioned TWO-LEVEL IVF-PQ index: hier quantizer round-trips, " +
       "frozen append is probe-visible, partitions prune") {
    val a = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val b = (100L until 112L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("vhier").toString + "/idx"
    val v1 = Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16, m = 4,
      kCodes = 4, root, sampleBudget = 60)
    assert(v1 == 1 && Similarity.currentIvfVersion(spark, root).contains(1))
    // the persisted quantizer round-trips EXACTLY (ids, k2, values)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val hqTrained = Similarity.trainHierQuantizer(a, nCells = 9,
      sampleBudget = 60)
    assert(hq.k2 == hqTrained.k2)
    assert(hq.top.map(_._1) == hqTrained.top.map(_._1))
    assert(hq.top.zip(hqTrained.top).forall { case ((_, x), (_, y)) =>
      x.toSeq == y.toSeq })
    assert(hq.sub.keySet == hqTrained.sub.keySet)
    assert(hq.sub.forall { case (c1, scs) =>
      scs.map(_._1) == hqTrained.sub(c1).map(_._1) &&
        scs.zip(hqTrained.sub(c1)).forall { case ((_, x), (_, y)) =>
          x.toSeq == y.toSeq } })
    // self-contained query sees the base corpus
    assert(Similarity.queryVersionedIvfPqIndexHier(spark, root, a.limit(2),
      k = 1, nProbe = 9, probeTop = 3).count() == 2L)
    // frozen-quantizer append: new rows probe-visible with no rewrite
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    Similarity.appendToIvfPqIndexHier(b, hq, cb, s"$root/v1/cells")
    val got = Similarity.queryVersionedIvfPqIndexHier(spark, root,
      b.limit(3), k = 12, nProbe = 9, probeTop = 3)
      .select("nbr_id").as[Long].collect().toSet
    assert(got.exists(_ >= 100L), "appended rows never surfaced in a probe")
    // static partition pruning survives the hier probe + codes payload
    val plan = Similarity.queryVersionedIvfPqIndexHier(spark, root,
        a.limit(2), k = 1, nProbe = 2, probeTop = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell_id"),
      s"expected partition pruning in:\n$plan")
    // retrain cutover: a second refresh publishes v2, v1 stays readable
    val v2 = Similarity.refreshIvfPqIndexHier(a.unionByName(b), nCells = 9,
      dim = 16, m = 4, kCodes = 4, root, sampleBudget = 72)
    assert(v2 == 2 && Similarity.currentIvfVersion(spark, root).contains(2))
    assert(new java.io.File(s"$root/v1/cells").exists())
    // out-of-band prune: an uncommitted v3 from a live/dead refresher
    // sits ABOVE the latest committed version and must survive; keep=2
    // deletes nothing; keep=1 deletes exactly v1
    val stale = new java.io.File(s"$root/v3")
    stale.mkdirs()
    assert(new java.io.File(stale, ".claim").createNewFile())
    assert(Similarity.pruneIvfVersions(spark, root, keep = 2) == Nil)
    assert(Similarity.pruneIvfVersions(spark, root, keep = 1) == Seq(1))
    assert(!new java.io.File(s"$root/v1").exists())
    assert(stale.exists())
    assert(Similarity.currentIvfVersion(spark, root).contains(2))
    // the survivor still serves self-contained queries
    assert(Similarity.queryVersionedIvfPqIndexHier(spark, root, b.limit(2),
      k = 1, nProbe = 9, probeTop = 3).count() == 2L)
    // a root with no committed version is never touched
    val fresh = java.nio.file.Files.createTempDirectory("vempty").toString
    new java.io.File(s"$fresh/v1").mkdirs()
    assert(Similarity.pruneIvfVersions(spark, fresh, keep = 1) == Nil)
    assert(new java.io.File(s"$fresh/v1").exists())
    // grace window (ADVICE round 10): refresh v4 so the uncommitted v3
    // falls BELOW the cut — its FRESH .claim marks a possibly-live slow
    // refresher, so the default grace must skip it (deleting it
    // mid-write would hand its caller a torn directory), while an
    // expired claim (grace 0) is an abandoned crash and goes
    val v4 = Similarity.refreshIvfPqIndexHier(a.unionByName(b), nCells = 9,
      dim = 16, m = 4, kCodes = 4, root, sampleBudget = 72)
    assert(v4 == 4)
    assert(Similarity.pruneIvfVersions(spark, root, keep = 1) == Seq(2))
    assert(stale.exists(),
      "fresh uncommitted claim below the cut must survive the grace window")
    assert(Similarity.pruneIvfVersions(spark, root, keep = 1,
      uncommittedGraceMs = 0L) == Seq(3))
    assert(!stale.exists())
    // a claimless junk dir below the cut is removed regardless of grace
    val junk = new java.io.File(s"$root/v3")
    junk.mkdirs()
    assert(Similarity.pruneIvfVersions(spark, root, keep = 1) == Seq(3))
    assert(!junk.exists())
    assert(Similarity.currentIvfVersion(spark, root).contains(4))
  }

  test("delta compaction folds only the listed batches, retires only them, carries frozen artifacts") {
    import org.apache.spark.sql.functions._
    val a = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val d0 = (100L until 110L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val d1 = (200L until 210L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    Seq((0L, d0), (1L, d1)).foreach { case (bid, df) =>
      Similarity.assignCellsHier(
          df.select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
          hq, "nbr_vec")
        .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
          $"cell_id")
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$ingest/batch=$bid")
    }
    // an absent/empty ingest root folds nothing and publishes nothing
    assert(Similarity.compactIvfPqIndexHier(spark, root,
      s"$tmp/__missing") == (1, Nil))
    // subset fold: ONLY batch 0 folded, ONLY batch 0 retired
    val (v2, f) = Similarity.compactIvfPqIndexHier(spark, root, ingest,
      Some(Seq(0L)))
    assert(v2 == 2 && f == Seq(0L))
    assert(!new java.io.File(s"$ingest/batch=0").exists())
    assert(new java.io.File(s"$ingest/batch=1").isDirectory,
      "an unfolded batch must survive retirement")
    val v2rows = spark.read.parquet(s"$root/v2/cells")
      .select("nbr_id").as[Long].collect().toSet
    assert(v2rows == (0L until 60L).toSet ++ (100L until 110L).toSet,
      "v2 must hold exactly base + folded rows")
    // the carried artifacts are byte-identical (frozen, never retrained)
    val hq2 = Similarity.readHierQuantizer(spark, s"$root/v2/quantizer")
    assert(hq2.k2 == hq.k2 &&
      hq2.top.map { case (i, v) => (i, v.toSeq) } ==
        hq.top.map { case (i, v) => (i, v.toSeq) })
    // remainder fold, then idempotence: nothing left to fold
    val (v3, f2) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v3 == 3 && f2 == Seq(1L))
    val v3rows = spark.read.parquet(s"$root/v3/cells")
      .select("nbr_id").as[Long].collect().toSet
    assert(v3rows == v2rows ++ (200L until 210L).toSet)
    assert(Similarity.compactIvfPqIndexHier(spark, root, ingest) == (3, Nil))
    assert(Similarity.currentIvfVersion(spark, root).contains(3))
    // the carried artifacts are SELF-CONTAINED: a versioned query over
    // the compacted root (resolves v3, reads its copied quantizer +
    // codebooks) equals the explicit-path probe with the v1 artifacts
    val q = a.limit(4)
    val viaVersioned = Similarity.queryVersionedIvfPqIndexHier(spark, root,
      q, k = 3, nProbe = 9, probeTop = 3)
    val viaPaths = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v3/cells"), hq, cb, q, k = 3, nProbe = 9, probeTop = 3)
    assert(viaVersioned.exceptAll(viaPaths).isEmpty &&
      viaPaths.exceptAll(viaVersioned).isEmpty,
      "versioned query over the compacted root diverged from the path probe")
  }

  test("tombstone deletes: probes mask immediately, compaction applies " +
       "physically and retires only the listed tombstones, late " +
       "tombstones keep masking") {
    import org.apache.spark.sql.functions._
    val a = (0L until 80L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("tomb").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 80)
    val q = a.limit(5)
    def probeIds() = Similarity.queryVersionedIvfPqIndexHier(spark, root,
      q, k = 5, nProbe = 9, probeTop = 3)
      .select("nbr_id").as[Long].collect().toSet
    val before = probeIds()
    val dead = Seq(3L, 7L, 11L, 42L)
    assert(dead.exists(before.contains),
      "fixture defect: no tombstoned id appears in the undeleted probe")
    // delete → masked at probe BEFORE any compaction, results otherwise
    // drawn from survivors only
    val del0 = Similarity.deleteFromIvfPqIndexHier(spark, root,
      dead.toDF("vec_id"))
    assert(del0 == 0L)
    val masked = probeIds()
    assert(dead.forall(id => !masked.contains(id)),
      s"tombstoned ids leaked into the probe: $masked")
    // a probe result row count stays k per query (deleted rows can't
    // occupy slots): every query still yields 5 candidates from the
    // 76 survivors
    assert(Similarity.queryVersionedIvfPqIndexHier(spark, root, q,
      k = 5, nProbe = 9, probeTop = 3).groupBy("query_id").count()
      .select("count").as[Long].collect().forall(_ == 5L))
    // compaction with NO deltas but live tombstones publishes a new
    // version, drops the rows physically, retires the tombstone dir
    val (v2, folded) = Similarity.compactIvfPqIndexHier(spark, root,
      s"$tmp/__no_ingest")
    assert(v2 == 2 && folded == Nil)
    val v2rows = spark.read.parquet(s"$root/v2/cells")
      .select("nbr_id").as[Long].collect().toSet
    assert(dead.forall(id => !v2rows.contains(id)) &&
      v2rows.size == 76, "physical delete incomplete")
    assert(!new java.io.File(s"$root/tombstones/del=0").exists(),
      "applied tombstone must be retired")
    // probe equality across the physical/masked boundary
    assert(probeIds() == masked,
      "probe changed across tombstone compaction")
    // a LATE tombstone (after the compaction) masks at probe while the
    // rows stay physically present until the next compaction
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(15L).toDF("vec_id"))
    assert(!probeIds().contains(15L))
    assert(spark.read.parquet(s"$root/v2/cells")
      .filter($"nbr_id" === 15L).count() == 1L)
    // idempotence: nothing listed → nothing published... but the live
    // late tombstone DOES publish v3 and retires itself
    val (v3, f3) = Similarity.compactIvfPqIndexHier(spark, root,
      s"$tmp/__no_ingest")
    assert(v3 == 3 && f3 == Nil)
    assert(spark.read.parquet(s"$root/v3/cells")
      .filter($"nbr_id" === 15L).count() == 0L)
    assert(Similarity.compactIvfPqIndexHier(spark, root,
      s"$tmp/__no_ingest") == (3, Nil))
    assert(Similarity.readTombstoneIds(spark, root).isEmpty,
      "retired tombstones must leave the no-deletes fast path")
    // the mask is a BROADCAST anti-join: no shuffle of the candidate
    // set enters the plan because of deletes (the churn-bounded side
    // broadcasts), and the no-deletes probe carries no anti-join at all
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(9L).toDF("vec_id"))
    val hq3 = Similarity.readHierQuantizer(spark, s"$root/v3/quantizer")
    val cb3 = Similarity.readPqCodebooks(spark, root, 3)
    val tombPlan = Similarity.queryIvfPqIndexHierPaths(spark,
        Seq(s"$root/v3/cells"), hq3, cb3, q, k = 5, nProbe = 9,
        probeTop = 3, tombstones = Similarity.readTombstoneIds(spark, root))
      .queryExecution.executedPlan.toString
    assert(tombPlan.contains("BroadcastHashJoin") &&
      tombPlan.toLowerCase.contains("leftanti"),
      s"tombstone mask must be a broadcast anti-join:\n$tombPlan")
    val cleanPlan = Similarity.queryIvfPqIndexHierPaths(spark,
        Seq(s"$root/v3/cells"), hq3, cb3, q, k = 5, nProbe = 9,
        probeTop = 3)
      .queryExecution.executedPlan.toString
    assert(!cleanPlan.toLowerCase.contains("leftanti"),
      "the no-deletes probe must not pay an anti-join")
  }

  test("driver-local trainers are partition-layout-independent and " +
       "lloydLocal handles the degenerate shapes") {
    val rows = (0L until 80L).map(i => (i, vec(16)))
    val base = rows.toDF("vec_id", "embedding")
    // the scaladoc's determinism CLAIM, pinned: same corpus → same
    // quantizer on any cluster layout (the sample is a hash-rank
    // bounded top-N over unique ids; no step consults partitioning)
    def key(h: graft.operators.Similarity.HierQuantizer) =
      (h.k2, h.top.map { case (i, v) => (i, v.toSeq) },
        h.sub.toSeq.sortBy(_._1).map { case (c, s) =>
          (c, s.map { case (g, v) => (g, v.toSeq) }) })
    val a = Similarity.trainHierQuantizer(base.repartition(7), nCells = 9,
      sampleBudget = 48)
    val b = Similarity.trainHierQuantizer(base.repartition(3), nCells = 9,
      sampleBudget = 48)
    assert(key(a) == key(b))
    val ca = Similarity.pqTrainSampled(base.repartition(5), dim = 16,
      m = 4, k = 8, sampleBudget = 48)
    val cd = Similarity.pqTrainSampled(base.coalesce(1), dim = 16,
      m = 4, k = 8, sampleBudget = 48)
    assert(ca == cd)
    // lloydLocal: k > n clamps to n centroids; an empty cluster keeps
    // its seed (two identical points, k=2 → the duplicate seed stays)
    val pts = Array(Array(1.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0))
    assert(Similarity.lloydLocal(pts.take(1), k = 5, iters = 3).length == 1)
    val two = Similarity.lloydLocal(
      Array(Array(1.0, 0.0), Array(1.0, 0.0)), k = 2, iters = 4)
    assert(two.length == 2 && two(0).toSeq == Seq(1.0, 0.0) &&
      two(1).toSeq == Seq(1.0, 0.0))
  }

  test("large-quantizer assignment (HOF path) agrees with the codegen path") {
    // the single-array-literal HOF formulation is now the ONLY path
    // (the per-centroid codegen'd projection trips the JIT huge-method
    // bailout at scale — ~130x slower per cosine at k=40, sf10); the
    // retired formulation is kept HERE as the equivalence witness
    import org.apache.spark.sql.functions.{array, struct, lit, array_min}
    val corpus = (0L until 40L).map(i => (i, vec(8))).toDF("id", "v")
    val big = (0 until 70).map(i =>
      i -> Array.tabulate(8)(d => math.sin(i * 8 + d + 1).toFloat))
    val viaHof = Similarity.assignCells(corpus, big, "v", 1)
      .select("id", "cell_id").as[(Long, Int)].collect().toMap
    // witness 1: the retired per-centroid literal-array formulation
    val small = big.take(16)
    val literalScored = array(small.map { case (i, c) =>
      struct((lit(0.0) - Similarity.cosine($"v",
        array(c.toSeq.map(lit(_)): _*))).as("neg_sim"),
        lit(i).as("cell_id"))
    }: _*)
    val viaLiteral = corpus
      .withColumn("cell_id", array_min(literalScored).getField("cell_id"))
      .select("id", "cell_id").as[(Long, Int)].collect().toMap
    val viaHofSmall = Similarity.assignCells(corpus, small, "v", 1)
      .select("id", "cell_id").as[(Long, Int)].collect().toMap
    assert(viaLiteral == viaHofSmall,
      "HOF assignment must equal the retired codegen'd literal formulation")
    // witness 2: per-row check against a driver-side argmax
    val vecs = corpus.as[(Long, Seq[Float])].collect().toMap
    def cos(a: Seq[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    vecs.foreach { case (id, v) =>
      val bestCell = big.map { case (i, c) => (-cos(v, c), i) }.min._2
      assert(viaHof(id) == bestCell, s"id $id")
    }
    val plan = Similarity.assignCells(corpus, big, "v", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("tombstones are NOT retired while unfolded deltas remain — a " +
       "deleted row in an unfolded batch cannot resurrect (r11 ADVICE)") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("resurrect").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    // two delta batches; the row the takedown targets sits in batch=1
    Seq((0L, 100L until 110L), (1L, 200L until 210L)).foreach {
      case (bid, ids) =>
        Similarity.assignCellsHier(
            ids.map(i => (i, vec(16))).toDF("vec_id", "embedding")
              .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
            hq, "nbr_vec")
          .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
            $"cell_id")
          .write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$ingest/batch=$bid")
    }
    Similarity.deleteFromIvfPqIndexHier(spark, root,
      Seq(205L, 3L).toDF("vec_id"))
    val q = base.limit(5)
    def liveIds() = Similarity.queryLiveIvfPqIndexHier(spark, root, ingest,
      q, k = 8, nProbe = 9, probeTop = 3)
      .select("nbr_id").as[Long].collect().toSet
    assert(!liveIds().contains(205L) && !liveIds().contains(3L),
      "tombstones must mask across base + every delta")
    // subset fold: batch=0 only — batch=1 (holding dead 205) survives,
    // so the tombstones MUST stay live
    val (v2, f) = Similarity.compactIvfPqIndexHier(spark, root, ingest,
      Some(Seq(0L)))
    assert(v2 == 2 && f == Seq(0L))
    assert(new java.io.File(s"$ingest/batch=1").isDirectory)
    assert(Similarity.readTombstoneIds(spark, root).nonEmpty,
      "retiring tombstones with an unfolded delta would resurrect 205")
    val after = liveIds()
    assert(!after.contains(205L) && !after.contains(3L),
      s"deleted ids resurrected after subset compaction: $after")
    // draining fold: batch=1 folded, tombstones applied + retired now
    val (v3, f2) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v3 == 3 && f2 == Seq(1L))
    assert(Similarity.readTombstoneIds(spark, root).isEmpty,
      "drained ingest must finally retire the applied tombstones")
    assert(spark.read.parquet(s"$root/v3/cells")
      .filter($"nbr_id".isin(205L, 3L)).isEmpty,
      "draining compaction must drop the dead rows physically")
    assert(!liveIds().contains(205L) && !liveIds().contains(3L))
  }

  test("a delta landing MID-compaction (after the fold listing) " +
       "survives retirement, stays probed, and keeps tombstones live") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("midrace").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    def writeBatch(bid: Long, rows: Seq[(Long, Seq[Float])]): Unit =
      Similarity.assignCellsHier(
          rows.toDF("vec_id", "embedding")
            .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
          hq, "nbr_vec")
        .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
          $"cell_id")
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$ingest/batch=$bid")
    writeBatch(0L, (100L until 110L).map(i => (i, vec(16))))
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(104L).toDF("vec_id"))
    // the race: batch=1 (carrying in-flight dead row 304) lands between
    // the fold listing and retirement, via the injection seam
    val lateRows = (300L to 304L).map(i => (i, vec(16)))
    val (v2, f) = Similarity.compactIvfPqIndexHier(spark, root, ingest,
      midCompactionHook = () => writeBatch(1L, lateRows))
    assert(v2 == 2 && f == Seq(0L),
      "mid-compaction delta must not join the already-listed fold")
    assert(new java.io.File(s"$ingest/batch=1").isDirectory,
      "the mid-compaction delta must survive retirement")
    assert(Similarity.readTombstoneIds(spark, root).nonEmpty,
      "tombstones must stay live while the late delta is unfolded")
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(304L).toDF("vec_id"))
    // queries = the late vectors themselves (fresh ids): nProbe=9 probes
    // every cell, so each surviving late row MUST surface at cosine 1
    val q = lateRows.map { case (i, v) => (1000L + i, v) }
      .toDF("vec_id", "embedding")
    val live = Similarity.queryLiveIvfPqIndexHier(spark, root, ingest,
        q, k = 8, nProbe = 9, probeTop = 3)
      .select("nbr_id").as[Long].collect().toSet
    assert(!live.contains(104L) && !live.contains(304L),
      "tombstones must mask the late delta too")
    assert(Seq(300L, 301L, 302L, 303L).forall(live.contains),
      "the late delta's surviving rows must stay probed")
  }

  test("concurrent refreshers claim distinct versions and both commit " +
       "(claim retry, last committer wins the cutover)") {
    import org.apache.spark.sql.functions._
    val a = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("refreshcas").toString
    val root = s"$tmp/idx"
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val versions = Await.result(Future.sequence((1 to 2).map(_ => Future {
      barrier.await()
      Similarity.refreshIvfPqIndexHier(a, nCells = 4, dim = 16,
        m = 4, kCodes = 4, root, sampleBudget = 40)
    })), 3.minutes)
    assert(versions.toSet == Set(1, 2),
      s"racing refreshers must land in distinct versions: $versions")
    assert(Similarity.currentIvfVersion(spark, root).contains(2))
    // both versions are complete and answer identically (same corpus,
    // same deterministic training)
    val q = a.limit(4)
    val via2 = Similarity.queryVersionedIvfPqIndexHier(spark, root, q,
      k = 3, nProbe = 4, probeTop = 2)
    val hq1 = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb1 = Similarity.readPqCodebooks(spark, root, 1)
    val via1 = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v1/cells"), hq1, cb1, q, k = 3, nProbe = 4, probeTop = 2)
    assert(via1.exceptAll(via2).isEmpty && via2.exceptAll(via1).isEmpty,
      "racing refreshers over the same corpus must answer identically")
  }

  test("concurrent deleters claim distinct del= slots and the sequence " +
       "stays monotonic across retirement") {
    import org.apache.spark.sql.functions._
    val a = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("delcas").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 4, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 40)
    // two deleters race the same slot: the claim-CAS must hand them
    // distinct numbers with BOTH id sets surviving
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val ids = Seq(Seq(1L, 2L), Seq(3L, 4L))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val claimed = Await.result(Future.sequence(ids.map(s => Future {
      barrier.await()
      Similarity.deleteFromIvfPqIndexHier(spark, root, s.toDF("vec_id"))
    })), 2.minutes)
    assert(claimed.toSet.size == 2, s"slot collision: $claimed")
    val survived = spark.read.parquet(s"$root/tombstones")
      .select("nbr_id").as[Long].collect().toSet
    assert(survived == Set(1L, 2L, 3L, 4L),
      s"a concurrent deleter's id set was clobbered: $survived")
    // retirement must not reset the sequence: numbers are never reused
    val maxBefore = claimed.max
    val (v2, _) = Similarity.compactIvfPqIndexHier(spark, root,
      s"$tmp/__no_ingest")
    assert(v2 == 2)
    assert(Similarity.readTombstoneIds(spark, root).isEmpty)
    val next = Similarity.deleteFromIvfPqIndexHier(spark, root,
      Seq(9L).toDF("vec_id"))
    assert(next == maxBefore + 1,
      s"sequence reset after retirement: got del=$next after del=$maxBefore")
  }

  test("readTombstoneIds snapshots eagerly: a concurrent retirement " +
       "cannot fail an in-flight probe plan") {
    import org.apache.spark.sql.functions._
    val a = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("tombsnap").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 4, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 40)
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(7L).toDF("vec_id"))
    val snap = Similarity.readTombstoneIds(spark, root)
    assert(snap.nonEmpty)
    // simulate the concurrent compaction: the del= dir vanishes between
    // plan construction and execution
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/tombstones/del=0"), true)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    val got = Similarity.queryIvfPqIndexHierPaths(spark,
        Seq(s"$root/v1/cells"), hq, cb, a.limit(4), k = 5, nProbe = 4,
        probeTop = 2, tombstones = snap)
      .select("nbr_id").as[Long].collect()
    assert(got.nonEmpty && !got.contains(7L),
      "the eager snapshot must keep masking after the dir is retired")
  }

  test("size-aware probe join: a batch above the broadcast cap takes " +
       "the merge-join plan and returns EXACTLY the broadcast rows") {
    import org.apache.spark.sql.functions._
    val a = (0L until 80L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("sizeaware").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 80)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    // the kNN-join shape: the whole corpus is the query batch
    val small = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v1/cells"), hq, cb, a, k = 5, nProbe = 4, probeTop = 2)
    val large = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v1/cells"), hq, cb, a, k = 5, nProbe = 4, probeTop = 2,
      maxBroadcastProbeRows = 0L)
    assert(small.exceptAll(large).isEmpty && large.exceptAll(small).isEmpty,
      "the shuffle-side probe join must be row-identical to broadcast")
    val smallPlan = small.queryExecution.executedPlan.toString
    val largePlan = large.queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin"),
      s"serving-sized batch must broadcast:\n$smallPlan")
    assert(largePlan.contains("SortMergeJoin"),
      s"above-cap batch must merge-join:\n$largePlan")
    assert(!largePlan.contains("BroadcastHashJoin"),
      s"above-cap batch must not broadcast the probe side:\n$largePlan")
  }

  test("exactRerank recovers the exact top-k whenever the pool holds " +
       "it, and the versioned rerank raises recall over raw ADC") {
    import org.apache.spark.sql.functions._
    val a = (0L until 100L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val q = a.limit(6)
    val exact = Similarity.bruteForceTopK(a, q, k = 5).localCheckpoint(true)
    // pool = the FULL ranked corpus per query → rerank must equal exact
    val fullPool = Similarity.bruteForceTopK(a, q, k = 100)
    val rr = Similarity.exactRerank(fullPool, a, q, k = 5)
    assert(rr.exceptAll(exact).isEmpty && exact.exceptAll(rr).isEmpty,
      "rerank over a complete pool must reproduce the exact top-k")
    // shuffle-side variant is row-identical
    val rrShuffle = Similarity.exactRerank(fullPool, a, q, k = 5,
      broadcastCandidates = false)
    assert(rrShuffle.exceptAll(exact).isEmpty &&
      exact.exceptAll(rrShuffle).isEmpty)
    // the production stack: versioned probe + rerank ≥ raw ADC recall
    val tmp = java.nio.file.Files.createTempDirectory("rerank").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 100)
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val e = exact.select("query_id", "nbr_id")
      approx.select("query_id", "nbr_id").intersect(e).count().toDouble /
        e.count()
    }
    val adc = recall(Similarity.queryVersionedIvfPqIndexHier(spark, root,
      q, k = 5, nProbe = 9, probeTop = 3))
    val reranked = recall(Similarity.queryVersionedIvfPqIndexHierRerank(
      spark, root, a, q, k = 5, nProbe = 9, probeTop = 3, poolFactor = 5))
    assert(reranked >= adc,
      f"rerank recall $reranked%.3f fell below raw ADC $adc%.3f")
  }

  test("adaptive probe selects exactly the minimal ranked-cell prefix " +
       "reaching the budget, and an unbounded budget equals the fixed " +
       "full-reach probe") {
    import org.apache.spark.sql.functions._
    val a = (0L until 90L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("adapt").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(a, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 90)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    val sizes = Similarity.indexCellSizes(spark, Seq(s"$root/v1/cells"))
      .localCheckpoint(true)
    val szMap = sizes.as[(Int, Long)].collect().toMap
    val q = a.limit(6).select(col("vec_id").as("query_id"),
      col("embedding").as("q_vec"))
    val minC = 25L
    // driver-side witness: the ranked reach per query, cut at the
    // minimal prefix whose cumulative size reaches the budget
    val ranked = Similarity.probeCellsHierRanked(q, hq, "q_vec", 3)
      .select("query_id", "__rank", "cell_id")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val want = ranked.map { case (qid, cells) =>
      var cum = 0L
      qid -> cells.takeWhile { c =>
        val keep = cum < minC; cum += szMap.getOrElse(c, 0L); keep
      }.toSet
    }
    val got = Similarity.probeCellsHierAdaptive(q, hq, "q_vec", 3,
        minC, sizes)
      .select("query_id", "cell_id").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got == want, s"adaptive prefix diverged:\n$got\nvs\n$want")
    // pool guarantee: every query reaches min(budget, total reach)
    want.foreach { case (qid, cells) =>
      val vol = cells.toSeq.map(szMap.getOrElse(_, 0L)).sum
      val reach = ranked(qid).map(szMap.getOrElse(_, 0L)).sum
      assert(vol >= math.min(minC, reach), s"query $qid pool $vol")
    }
    // unbounded budget ≡ fixed probe at full reach (nProbe = probeTop·k2)
    val adaptiveFull = Similarity.queryIvfPqIndexHierAdaptive(spark,
      Seq(s"$root/v1/cells"), hq, cb, a.limit(6), k = 5, probeTop = 3,
      candidateFactor = 1000, cellSizes = Some(sizes))
    val fixedFull = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v1/cells"), hq, cb, a.limit(6), k = 5,
      nProbe = 3 * hq.k2, probeTop = 3)
    assert(adaptiveFull.exceptAll(fixedFull).isEmpty &&
      fixedFull.exceptAll(adaptiveFull).isEmpty,
      "unbounded adaptive probe must equal the fixed full-reach probe")
  }

  test("queryLiveIvfPqIndexHier equals the manually-wired path probe") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("liveq").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    Similarity.assignCellsHier(
        (100L until 110L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
          .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
        $"cell_id")
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(105L).toDF("vec_id"))
    val q = base.limit(5)
    val live = Similarity.queryLiveIvfPqIndexHier(spark, root, ingest,
      q, k = 6, nProbe = 9, probeTop = 3)
    val manual = Similarity.queryIvfPqIndexHierPaths(spark,
      Seq(s"$root/v1/cells", s"$ingest/batch=0"), hq, cb, q, k = 6,
      nProbe = 9, probeTop = 3,
      tombstones = Similarity.readTombstoneIds(spark, root))
    assert(live.exceptAll(manual).isEmpty && manual.exceptAll(live).isEmpty,
      "the live convenience probe diverged from the manual wiring")
    assert(!live.select("nbr_id").as[Long].collect().contains(105L))
  }

  test("cellsizes rides every committed version as an artifact and the " +
       "versioned adaptive probe answers off it exactly") {
    import org.apache.spark.sql.functions._
    val base = (0L until 80L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("cellsz").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 80)
    // refresh persisted the artifact, and it equals the recompute
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1/cellsizes")),
      "refresh must persist v1/cellsizes before committing")
    val persisted = Similarity.readCellSizes(spark, root, v1)
    val recomputed = Similarity.indexCellSizes(spark, Seq(s"$root/v1/cells"))
    assert(persisted.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(persisted).isEmpty,
      "persisted cellsizes diverged from the recompute")
    // the versioned adaptive entry (reads the artifact) answers exactly
    // like the path entry fed the recomputed table
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    val q = base.limit(6)
    val viaArtifact = Similarity.queryVersionedIvfPqIndexHierAdaptive(
      spark, root, q, k = 4, probeTop = 3, candidateFactor = 3)
    val viaRecompute = Similarity.queryIvfPqIndexHierAdaptive(spark,
      Seq(s"$root/v1/cells"), hq, cb, q, k = 4, probeTop = 3,
      candidateFactor = 3, cellSizes = Some(recomputed))
    assert(viaArtifact.exceptAll(viaRecompute).isEmpty &&
      viaRecompute.exceptAll(viaArtifact).isEmpty,
      "adaptive probe off the artifact diverged from the recompute path")
    // compaction writes the NEW version's artifact too (sizes reflect
    // the fold: base plus the delta rows)
    Similarity.assignCellsHier(
        (200L until 212L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
          .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
        $"cell_id")
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    val (v2, folded) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v2 == 2 && folded == Seq(0L))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2/cellsizes")),
      "compaction must persist the new version's cellsizes")
    val p2 = Similarity.readCellSizes(spark, root, v2)
    val r2 = Similarity.indexCellSizes(spark, Seq(s"$root/v2/cells"))
    assert(p2.exceptAll(r2).isEmpty && r2.exceptAll(p2).isEmpty,
      "compacted cellsizes diverged from the folded cells")
    assert(p2.agg(sum($"cnt")).head.getLong(0) == 92L,
      "folded sizes must count base + delta rows")
    // back-compat: a version with no artifact (pre-r12 root) falls
    // back to the recompute seamlessly
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/v2/cellsizes"), true)
    val fallback = Similarity.readCellSizes(spark, root, v2)
    assert(fallback.exceptAll(r2).isEmpty && r2.exceptAll(fallback).isEmpty,
      "artifact-less version must fall back to the cells recompute")
  }

  test("a committed-but-unretired batch is never folded twice: the " +
       "manifest guard completes retirement instead of duplicating rows") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("dblfold").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    def writeBatch(b: Long, ids: Range.Inclusive): Unit =
      Similarity.assignCellsHier(
          ids.map(i => (i.toLong, vec(16))).toDF("vec_id", "embedding")
            .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
          hq, "nbr_vec")
        .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
          $"cell_id")
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$ingest/batch=$b")
    writeBatch(0L, 100 to 109)
    val batch0 = spark.read.parquet(s"$ingest/batch=0")
      .select("nbr_id", "codes", "cell_id").localCheckpoint(true)
    val (v2, f1) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v2 == 2 && f1 == Seq(0L))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2/folded")),
      "a publishing fold must write its manifest")
    // simulate the predecessor dying between commit and retirement:
    // resurrect batch=0 exactly as it was (its rows are already in v2)
    batch0.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    // nothing fresh, no tombstones → NO new version; retirement is
    // completed and the index keeps serving v2 with each row ONCE
    val (vSame, done) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(vSame == 2 && done == Seq(0L),
      s"retirement-completion fold must not publish: v$vSame, $done")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=0")),
      "the inherited batch dir must be retired")
    assert(spark.read.parquet(s"$root/v2/cells")
      .groupBy("nbr_id").count().filter($"count" > 1).isEmpty,
      "double-fold: a row appears twice after crash-resume")
    // mixed fold: resurrect batch=0 again AND land a genuinely new
    // batch=1 — only the fresh one joins the union, both dirs retire
    batch0.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    writeBatch(1L, 200 to 204)
    val (v3, f3) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v3 == 3 && f3 == Seq(0L, 1L))
    val v3cells = spark.read.parquet(s"$root/v3/cells")
    assert(v3cells.groupBy("nbr_id").count().filter($"count" > 1).isEmpty,
      "double-fold: the mixed compaction duplicated inherited rows")
    assert(v3cells.count() == 75L, // 60 base + 10 batch0 + 5 batch1
      s"mixed fold lost or duplicated rows: ${v3cells.count()}")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=1")),
      "both the inherited and the fresh batch dirs must retire")
    // the ledger CARRIES FORWARD through a tombstone-only publish: v4
    // publishes with no batches live (delete-only), then batch=1
    // replays — a per-fold manifest would treat it as fresh and
    // double-fold; the cumulative ledger must recognize it
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(5L).toDF("vec_id"))
    val (v4, f4) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v4 == 4 && f4.isEmpty, s"tombstone-only publish: v$v4, $f4")
    val batch1 = v3cells.filter($"nbr_id" >= 200L && $"nbr_id" <= 204L)
    batch1.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=1")
    val (v5, f5) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v5 == 4 && f5 == Seq(1L),
      s"replay after a tombstone-only publish must complete retirement " +
        s"without publishing: v$v5, $f5")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=1")),
      "the replayed dir must be retired")
    assert(spark.read.parquet(s"$root/v4/cells")
      .groupBy("nbr_id").count().filter($"count" > 1).isEmpty &&
      spark.read.parquet(s"$root/v4/cells")
        .filter($"nbr_id" === 5L).isEmpty,
      "ledger carry-forward failed: duplicate or undeleted row in v4")
  }

  test("queryCountHint sizes the probe join without a second " +
       "evaluation of an expensive query frame (r12 verdict item 3)") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("sizehint").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    // a side-effect-counting query frame: the UDF rides a FILTER (a
    // bare projection would be column-pruned out of the count), so
    // every evaluation of the frame bumps the accumulator per row
    val acc = spark.sparkContext.longAccumulator("qframe_evals")
    val tick = udf { (x: Long) => acc.add(1L); x }
    val q = base.filter(tick($"vec_id") % 10 === 0)
    val r1 = Similarity.queryVersionedIvfPqIndexHier(spark, root, q,
      k = 4, nProbe = 4, probeTop = 2).localCheckpoint(true)
    val evalsNoHint = acc.value
    acc.reset()
    val r2 = Similarity.queryVersionedIvfPqIndexHier(spark, root, q,
      k = 4, nProbe = 4, probeTop = 2, queryCountHint = Some(6L))
      .localCheckpoint(true)
    val evalsHint = acc.value
    assert(r1.exceptAll(r2).isEmpty && r2.exceptAll(r1).isEmpty,
      "hinted probe diverged from the counted one")
    assert(evalsHint < evalsNoHint,
      s"hint did not save an evaluation: $evalsHint vs $evalsNoHint")
  }

  test("deleting with null or non-castable ids fails loudly instead " +
       "of writing a no-op tombstone (r12 verdict item 4)") {
    val base = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("loudids").toString
    val root = s"$tmp/idx"
    Similarity.refreshIvfPqIndexHier(base, nCells = 4, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 40)
    val bad = Seq(Some(5L), None, Some(7L)).toDF("vec_id")
    val ex = intercept[IllegalArgumentException] {
      Similarity.deleteFromIvfPqIndexHier(spark, root, bad)
    }
    assert(ex.getMessage.contains("silently"),
      s"wrong failure: ${ex.getMessage}")
    // nothing was claimed or written by the refused call
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones/del=0")),
      "refused delete must not write a tombstone")
    // a clean id frame still works
    assert(Similarity.deleteFromIvfPqIndexHier(spark, root,
      Seq(5L).toDF("vec_id")) == 0L)
  }

  test("the claim primitive is pluggable: a store-native conditional " +
       "write slots in without lifecycle changes (r12 verdict item 5)") {
    val base = (0L until 40L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("claimplug").toString
    val root = s"$tmp/idx"
    // a primitive that loses its FIRST slot race (as a conditional
    // write would on a taken etag), then defers to create-exclusive
    class LoseFirst extends Similarity.ClaimPrimitive {
      var lost = 0
      override def tryClaim(fs: org.apache.hadoop.fs.FileSystem,
                            path: org.apache.hadoop.fs.Path): Boolean =
        if (lost == 0) { lost += 1; false }
        else Similarity.CreateExclusiveClaim.tryClaim(fs, path)
    }
    val lf = new LoseFirst
    val v = Similarity.refreshIvfPqIndexHier(base, nCells = 4, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 40, claim = lf)
    assert(v == 2 && lf.lost == 1,
      s"losing the v1 slot race must land the refresh at v2, got v$v")
    assert(Similarity.currentIvfVersion(spark, root).contains(2))
    // the delete's .seq= claim rides the same primitive
    val lf2 = new LoseFirst
    val seq = Similarity.deleteFromIvfPqIndexHier(spark, root,
      Seq(3L).toDF("vec_id"), claim = lf2)
    assert(seq == 1L && lf2.lost == 1,
      s"losing the .seq=0 race must land the delete at del=1, got $seq")
    // the index still serves: masked probe over the claimed layout
    val probe = Similarity.queryVersionedIvfPqIndexHier(spark, root,
      base.limit(5), k = 3, nProbe = 4, probeTop = 2)
    assert(probe.filter(org.apache.spark.sql.functions
      .col("nbr_id") === 3L).isEmpty, "tombstone under plugged claim lost")
  }

  test("training budget auto-scales to the requested cell count: " +
       "nCells >> budget no longer silently under-trains (r12 verdict)") {
    val corpus = (0L until 400L).map(i => (i, vec(8)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    // the failure shape: 64 requested cells on an 8-point budget would
    // seed at most 8 sub cells (≤1 seed each) — the auto-scaled budget
    // (4·nCells = 256 samples) must populate far more of the space
    val hq = Similarity.trainHierQuantizer(corpus, nCells = 64,
      sampleBudget = 8)
    assert(hq.nCells > 8,
      s"under-budget training produced only ${hq.nCells} cells — the " +
        "4·nCells budget floor did not engage")
    // determinism is unchanged: same corpus → same quantizer
    val hq2 = Similarity.trainHierQuantizer(corpus, nCells = 64,
      sampleBudget = 8)
    assert(hq.top.map { case (i, v) => (i, v.toSeq) } ==
      hq2.top.map { case (i, v) => (i, v.toSeq) } &&
      hq.sub.view.mapValues(_.map { case (g, v) => (g, v.toSeq) }).toMap ==
      hq2.sub.view.mapValues(_.map { case (g, v) => (g, v.toSeq) }).toMap,
      "auto-scaled training lost determinism")
  }

  test("sub-centroid broadcast-join path is row-identical to the " +
       "plan-literal path across assign/probe/ranked/adaptive " +
       "(r12 verdict item 1)") {
    import org.apache.spark.sql.functions._
    val corpus = (0L until 300L).map(i => (i, vec(16)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val quant = Similarity.trainHierQuantizer(corpus, nCells = 25,
      sampleBudget = 300)
    val nbrs = corpus.select($"vec_id".as("nbr_id"),
      $"embedding".as("nbr_vec"))
    // assignment: same rows, and the join path actually joins while the
    // literal path stays join-free (the plan-shape witness)
    val aLit = Similarity.assignCellsHier(nbrs, quant, "nbr_vec")
    val aJoin = Similarity.assignCellsHier(nbrs, quant, "nbr_vec",
      maxSubLiteralFloats = 0L)
    assert(aLit.exceptAll(aJoin).isEmpty && aJoin.exceptAll(aLit).isEmpty,
      "assignment diverged between literal and broadcast-join paths")
    assert(aJoin.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "forced join path must resolve the sub level via a broadcast join")
    assert(!aLit.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "literal path must stay join-free")
    val qs = corpus.limit(7).select($"vec_id".as("query_id"),
      $"embedding".as("q_vec"))
    // fixed probe, ranked probe, adaptive probe: element-identical
    val pLit = Similarity.probeCellsHier(qs, quant, "q_vec", 3, 4)
    val pJoin = Similarity.probeCellsHier(qs, quant, "q_vec", 3, 4,
      maxSubLiteralFloats = 0L)
    assert(pLit.exceptAll(pJoin).isEmpty && pJoin.exceptAll(pLit).isEmpty,
      "fixed probe diverged")
    val rLit = Similarity.probeCellsHierRanked(qs, quant, "q_vec", 3)
    val rJoin = Similarity.probeCellsHierRanked(qs, quant, "q_vec", 3,
      maxSubLiteralFloats = 0L)
    assert(rLit.exceptAll(rJoin).isEmpty && rJoin.exceptAll(rLit).isEmpty,
      "ranked probe diverged")
    val sizes = Similarity.assignCellsHier(nbrs, quant, "nbr_vec")
      .groupBy("cell_id").agg(count(lit(1)).as("cnt"))
    val adLit = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 3,
      minCandidates = 20L, cellSizes = sizes)
    val adJoin = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 3,
      minCandidates = 20L, cellSizes = sizes, maxSubLiteralFloats = 0L)
    assert(adLit.exceptAll(adJoin).isEmpty && adJoin.exceptAll(adLit).isEmpty,
      "adaptive probe diverged")
    // end-to-end top-k equality through the whole operator
    val tLit = Similarity.ivfTopKHier(corpus, corpus.limit(7), k = 5, quant,
      nProbe = 4, probeTop = 3)
    val tJoin = Similarity.ivfTopKHier(corpus, corpus.limit(7), k = 5, quant,
      nProbe = 4, probeTop = 3, maxSubLiteralFloats = 0L)
    assert(tLit.exceptAll(tJoin).isEmpty && tJoin.exceptAll(tLit).isEmpty,
      "ivfTopKHier diverged")
    // the edge branches: a SUB-LESS top cell (fallback id) and a
    // probeTop beyond k1 (trailing null slot) behave identically
    val d = 8
    def unit(i: Int): Array[Float] =
      Array.tabulate(d)(j => if (j == i) 1f else 0f)
    val hq3 = Similarity.HierQuantizer(2,
      top = Seq((0, unit(0)), (1, unit(1)), (2, unit(2))),
      sub = Map(0 -> Seq((0, unit(0)), (1, unit(3))),
                1 -> Seq((2, unit(1)))))  // top cell 2 has NO sub entry
    val pts = (0L until 40L).map(i => (i, vec(d)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val n3 = pts.select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec"))
    val e1 = Similarity.assignCellsHier(n3, hq3, "nbr_vec")
    val e2 = Similarity.assignCellsHier(n3, hq3, "nbr_vec",
      maxSubLiteralFloats = 0L)
    assert(e1.exceptAll(e2).isEmpty && e2.exceptAll(e1).isEmpty,
      "sub-less fallback diverged between paths")
    val q3 = pts.limit(5).select($"vec_id".as("query_id"),
      $"embedding".as("q_vec"))
    val f1 = Similarity.probeCellsHier(q3, hq3, "q_vec", 5, 6)
    val f2 = Similarity.probeCellsHier(q3, hq3, "q_vec", 5, 6,
      maxSubLiteralFloats = 0L)
    assert(f1.exceptAll(f2).isEmpty && f2.exceptAll(f1).isEmpty,
      "probeTop>k1 trailing-slot handling diverged between paths")
  }

  test("forced-join probe ships the sub-centroid table ONCE: the " +
       "probeTop slot joins reuse one broadcast exchange (r13 ADVICE)") {
    import org.apache.spark.sql.functions._
    val corpus = (0L until 200L).map(i => (i, vec(16)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val quant = Similarity.trainHierQuantizer(corpus, nCells = 25,
      sampleBudget = 200)
    val qs = corpus.limit(5).select($"vec_id".as("query_id"),
      $"embedding".as("q_vec"))
    // AQE off so ReuseExchangeAndSubquery's plan is directly inspectable
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Similarity.probeCellsHier(qs, quant, "q_vec", probeTop = 3,
        nProbe = 4, maxSubLiteralFloats = 0L)
      val plan = p.queryExecution.executedPlan.toString
      val reused = "ReusedExchange".r.findAllIn(plan).size
      assert(reused >= 2, // probeTop − 1 slots must reuse slot 0's
        s"expected >=2 ReusedExchange nodes (probeTop=3), got $reused:\n" +
          plan.linesIterator.take(40).mkString("\n"))
      val fresh = plan.linesIterator
        .count(l => l.contains("BroadcastExchange") &&
          !l.contains("ReusedExchange"))
      assert(fresh == 1,
        s"expected exactly ONE materialized BroadcastExchange, got $fresh")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("a RETRAIN carries the folded ledger forward: a dir replayed " +
       "after a refresh is retired, never re-folded (r12 ADVICE)") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("refledger").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    val delta = (100L until 110L).map(i => (i, vec(16)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    Similarity.assignCellsHier(
        delta.select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
        $"cell_id")
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    val batch0 = spark.read.parquet(s"$ingest/batch=0")
      .select("nbr_id", "codes", "cell_id").localCheckpoint(true)
    val (v2, f1) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v2 == 2 && f1 == Seq(0L))
    // the predecessor died between commit and retirement: batch=0 is
    // live again, byte-identical — and then a RETRAIN publishes v3
    // from the full live corpus (the fold's rows included)
    batch0.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    val v3 = Similarity.refreshIvfPqIndexHier(base.unionByName(delta),
      nCells = 9, dim = 16, m = 4, kCodes = 4, root, sampleBudget = 70)
    assert(v3 == 3)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$root/v3/folded")),
      "a refresh must carry the predecessor's folded ledger forward")
    // the post-refresh compaction must recognize the replayed dir as
    // inherited: retirement completed, NO new version, no duplication
    val (vSame, done) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(vSame == 3 && done == Seq(0L),
      s"replay after a retrain must complete retirement without " +
        s"publishing: v$vSame, $done")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=0")),
      "the replayed dir must be retired")
    assert(spark.read.parquet(s"$root/v3/cells")
      .groupBy("nbr_id").count().filter($"count" > 1).isEmpty &&
      spark.read.parquet(s"$root/v3/cells").count() == 70L,
      "refresh ledger carry-forward failed: duplicate or lost row in v3")
  }

  test("a reused batch id carrying NEW data fails the compaction " +
       "loudly instead of being silently retired (r12 ADVICE)") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("idreuse").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    def writeBatch(b: Long, ids: Seq[Long]): Unit =
      Similarity.assignCellsHier(
          ids.map(i => (i, vec(16))).toDF("vec_id", "embedding")
            .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
          hq, "nbr_vec")
        .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
          $"cell_id")
        .write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$ingest/batch=$b")
    writeBatch(0L, 100L until 110L)
    val (v2, f1) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(v2 == 2 && f1 == Seq(0L))
    // a reset checkpoint restarts batchId at 0: genuinely NEW rows land
    // in a ledger-listed id — retiring them unfolded would destroy them
    writeBatch(0L, 300L until 305L)
    val ex = intercept[IllegalStateException] {
      Similarity.compactIvfPqIndexHier(spark, root, ingest)
    }
    assert(ex.getMessage.contains("reused batch id"),
      s"wrong failure: ${ex.getMessage}")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=0")),
      "the suspect dir must be left untouched")
    assert(spark.read.parquet(s"$ingest/batch=0").count() == 5L,
      "the new data must survive the refused compaction")
    // no version was published by the refused call
    assert(Similarity.currentIvfVersion(spark, root).contains(2))
  }

  test("a pre-fingerprint ledger (batch column only) still recognizes " +
       "replayed dirs by id — back-compat with r12 roots") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("oldledger").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    Similarity.assignCellsHier(
        (100L until 110L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
          .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
        $"cell_id")
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    val batch0 = spark.read.parquet(s"$ingest/batch=0")
      .select("nbr_id", "codes", "cell_id").localCheckpoint(true)
    val (v2, _) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    // rewrite v2's ledger in the r12 single-column shape
    Seq(0L).toDF("batch").coalesce(1).write.mode("overwrite")
      .parquet(s"$root/v$v2/folded")
    // replay the retired dir byte-identically: the id-only ledger must
    // still absorb it (retire, no fold, no fingerprint failure)
    batch0.write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    val (vSame, done) = Similarity.compactIvfPqIndexHier(spark, root, ingest)
    assert(vSame == v2 && done == Seq(0L),
      s"id-only ledger must complete retirement: v$vSame, $done")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ingest/batch=0")))
    assert(spark.read.parquet(s"$root/v$v2/cells")
      .groupBy("nbr_id").count().filter($"count" > 1).isEmpty)
  }

  test("live adaptive probe equals the path probe over explicitly " +
       "summed base+delta sizes, with tombstones masked") {
    import org.apache.spark.sql.functions._
    val base = (0L until 60L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("liveadpt").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val v1 = Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 60)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, v1)
    val deltaRows = (100L until 112L).map(i => (i, vec(16)))
    Similarity.assignCellsHier(
        deltaRows.toDF("vec_id", "embedding")
          .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
        hq, "nbr_vec")
      .select($"nbr_id", Similarity.pqEncode($"nbr_vec", cb).as("codes"),
        $"cell_id")
      .write.mode("overwrite").partitionBy("cell_id")
      .parquet(s"$ingest/batch=0")
    Similarity.deleteFromIvfPqIndexHier(spark, root, Seq(107L).toDF("vec_id"))
    val q = base.limit(5)
    val live = Similarity.queryLiveIvfPqIndexHierAdaptive(spark, root,
      ingest, q, k = 6, probeTop = 3, candidateFactor = 4)
    // the witness: the path-based adaptive probe fed a size table
    // recomputed from scratch over (cells ∪ deltas) — counts add, so
    // the live entry's artifact+delta sum must match it exactly
    val unionSizes = Similarity.indexCellSizes(spark,
      Seq(s"$root/v1/cells", ingest))
    val manual = Similarity.queryIvfPqIndexHierAdaptive(spark,
      Seq(s"$root/v1/cells", ingest), hq, cb, q, k = 6, probeTop = 3,
      candidateFactor = 4, cellSizes = Some(unionSizes),
      tombstones = Similarity.readTombstoneIds(spark, root))
    assert(live.exceptAll(manual).isEmpty && manual.exceptAll(live).isEmpty,
      "live adaptive probe diverged from the explicit union-size wiring")
    assert(!live.select("nbr_id").as[Long].collect().contains(107L),
      "live adaptive probe surfaced a tombstoned id")
    // delta rows are reachable (their own vectors as queries)
    val deltaQ = deltaRows.filter(_._1 != 107L).take(4)
      .map { case (i, v) => (i + 5000L, v) }.toDF("vec_id", "embedding")
    val hit = Similarity.queryLiveIvfPqIndexHierAdaptive(spark, root,
        ingest, deltaQ, k = 3, probeTop = 3, candidateFactor = 20)
      .filter($"nbr_id" >= 100L && $"nbr_id" < 112L)
    assert(hit.limit(1).count() == 1L,
      "no delta row surfaced through the live adaptive probe")
  }

  test("model-based lifecycle: a seeded random ingest/delete/compact/" +
       "replay sequence preserves the live id set at every step and " +
       "exactly-once physical rows after every draining compaction") {
    import scala.collection.mutable
    // A driver-side reference model drives 24 random lifecycle ops and
    // checks, after EVERY op, that the live index state — latest
    // committed cells ∪ live batch dirs, tombstones masked — holds
    // exactly the model's live id SET (catches loss, resurrection,
    // phantom rows), and after every DRAINING compaction that each id
    // is physically present exactly ONCE (catches double-folds).
    // `replay` recreates the most recently retired batch dir
    // byte-identically — the foreachBatch at-least-once crash replay —
    // which the folded-manifest guard must absorb without duplication.
    val seed = 20260816
    val rnd = new scala.util.Random(seed)
    val tmp = java.nio.file.Files.createTempDirectory("lifecycle").toString
    val root = s"$tmp/idx"
    val ingest = s"$tmp/ingest"
    val ingestPath = new org.apache.hadoop.fs.Path(ingest)
    val fs = ingestPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = (0L until 50L).map(i => (i, vec(16))).toDF("vec_id", "embedding")
    Similarity.refreshIvfPqIndexHier(base, nCells = 9, dim = 16,
      m = 4, kCodes = 4, root, sampleBudget = 50)
    val hq = Similarity.readHierQuantizer(spark, s"$root/v1/quantizer")
    val cb = Similarity.readPqCodebooks(spark, root, 1)
    val live = mutable.Set[Long]((0L until 50L): _*)
    var nextId = 100L
    var nextBatch = 0L
    // retired batch contents, for the replay op (batchId -> its rows)
    val written = mutable.Map[Long, org.apache.spark.sql.DataFrame]()
    def liveBatches(): Seq[Long] =
      if (!fs.exists(ingestPath)) Nil
      else fs.listStatus(ingestPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong)
        .sorted
    def writeBatchDir(b: Long, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").partitionBy("cell_id")
        .parquet(s"$ingest/batch=$b")
    def physicalRows(): org.apache.spark.sql.DataFrame = {
      val v = Similarity.currentIvfVersion(spark, root).get
      val roots = s"$root/v$v/cells" +:
        liveBatches().map(b => s"$ingest/batch=$b")
      val all = roots.map(p => spark.read.parquet(p).select("nbr_id"))
        .reduce(_ unionByName _)
      Similarity.readTombstoneIds(spark, root).fold(all)(t =>
        all.join(t, Seq("nbr_id"), "left_anti"))
    }
    def checkSet(op: String): Unit = {
      val ids = physicalRows().distinct().as[Long].collect().toSet
      assert(ids == live.toSet,
        s"after $op: live set mismatch — missing ${live.toSet -- ids}, " +
          s"phantom ${ids -- live.toSet}")
    }
    for (step <- 1 to 24) {
      val op = rnd.nextInt(10) match {
        case 0 | 1 | 2 =>                                   // ingest
          val ids = (nextId until nextId + 4 + rnd.nextInt(5)).toSeq
          nextId = ids.max + 1
          val df = Similarity.assignCellsHier(
              ids.map(i => (i, vec(16))).toDF("vec_id", "embedding")
                .select($"vec_id".as("nbr_id"), $"embedding".as("nbr_vec")),
              hq, "nbr_vec")
            .select($"nbr_id",
              Similarity.pqEncode($"nbr_vec", cb).as("codes"), $"cell_id")
            .localCheckpoint(true)
          writeBatchDir(nextBatch, df)
          written(nextBatch) = df
          nextBatch += 1
          live ++= ids
          s"ingest(batch=${nextBatch - 1}, ${ids.size} ids)"
        case 3 | 4 =>                                       // delete
          // base ids only: a replayed dir may transiently resurface a
          // physically-deleted DELTA id once its tombstone retired (the
          // documented replay window); base rows never ride batch dirs,
          // so their deletes are permanent and model-checkable at every
          // step
          val candidates = live.filter(_ < 50L).toSeq
          if (candidates.isEmpty) "noop" else {
            val targets = rnd.shuffle(candidates).take(1 + rnd.nextInt(3))
            Similarity.deleteFromIvfPqIndexHier(spark, root,
              targets.toDF("vec_id"))
            live --= targets
            s"delete(${targets.sorted.mkString(",")})"
          }
        case 5 | 6 =>                                       // subset compact
          val lb = liveBatches()
          if (lb.isEmpty) "noop" else {
            val subset = rnd.shuffle(lb).take(1 + rnd.nextInt(lb.size))
            Similarity.compactIvfPqIndexHier(spark, root, ingest,
              Some(subset.sorted))
            s"compact(subset=${subset.sorted.mkString(",")})"
          }
        case 7 | 8 =>                                       // draining compact
          Similarity.compactIvfPqIndexHier(spark, root, ingest)
          val v = Similarity.currentIvfVersion(spark, root).get
          val dups = spark.read.parquet(s"$root/v$v/cells")
            .groupBy("nbr_id").count().filter($"count" > 1)
            .as[(Long, Long)].collect()
          assert(dups.isEmpty,
            s"step $step: draining compact left duplicates: " +
              dups.take(5).mkString(","))
          assert(liveBatches().isEmpty,
            s"step $step: draining compact left live batches")
          "compact(drain)"
        case 9 =>                                           // crash replay
          val retired = written.keys.toSeq.filterNot(liveBatches().contains)
          if (retired.isEmpty) "noop" else {
            val b = retired(rnd.nextInt(retired.size))
            writeBatchDir(b, written(b))
            s"replay(batch=$b)"
          }
      }
      checkSet(s"step $step $op")
    }
    // finish with a drain: after absorbing every replay, each live id
    // must be physically present exactly once
    Similarity.compactIvfPqIndexHier(spark, root, ingest)
    val v = Similarity.currentIvfVersion(spark, root).get
    val counts = spark.read.parquet(s"$root/v$v/cells")
      .groupBy("nbr_id").count()
    assert(counts.filter($"count" > 1).isEmpty,
      "final drain left a duplicated row")
    checkSet("final drain")
  }

  test("parallel lloydLocal is byte-identical to the sequential fit " +
       "above the fan-out floor (r14 verdict item 1)") {
    // n·k·dim = 4000·32·160 ≈ 20.5M flops > the 16M parallel floor, so
    // the assignment step runs on the common pool — the centroids must
    // still match a plain sequential Lloyd bit for bit (pure per-point
    // assignment + sequential in-order accumulation).
    val r = new scala.util.Random(11)
    val n = 4000; val k = 32; val dim = 160
    val pts = Array.fill(n)(Array.fill(dim)(r.nextDouble() - 0.5))
    def seqLloyd(points: Array[Array[Double]], k: Int,
                 iters: Int): Array[Array[Double]] = {
      var cents = Array.tabulate(math.min(k, points.length))(i =>
        points(i).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length)(new Array[Double](dim))
        val counts = new Array[Long](cents.length)
        points.foreach { p =>
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < cents.length) {
            val ce = cents(c); var d = 0.0; var j = 0
            while (j < dim) { val t = p(j) - ce(j); d += t * t; j += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          counts(best) += 1
          val sb = sums(best); var j = 0
          while (j < dim) { sb(j) += p(j); j += 1 }
        }
        cents = Array.tabulate(cents.length) { c =>
          if (counts(c) == 0L) cents(c)
          else { val s = sums(c)
            Array.tabulate(dim)(j => s(j) / counts(c)) }
        }
      }
      cents
    }
    val got = Similarity.lloydLocal(pts.map(_.clone()), k, iters = 10)
    val want = seqLloyd(pts, k, iters = 10)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.sameElements(w), s"centroid $i diverged under parallel fit")
    }
  }

  test("trainHierQuantizerDistributed with topBudget >= effBudget is " +
       "BIT-IDENTICAL to the driver-local fit (r14 verdict item 1)") {
    val corpus = (0L until 600L).map(i => (i, vec(12)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    // nCells = 36 → k1 = 6, k2 = 6; effBudget = max(200, 144) = 200
    val local = Similarity.trainHierQuantizer(corpus, nCells = 36,
      sampleBudget = 200)
    val dist = Similarity.trainHierQuantizerDistributed(corpus, nCells = 36,
      sampleBudget = 200, topBudget = 4096)
    assert(dist.k2 == local.k2, "k2 diverged")
    assert(dist.top.map { case (i, v) => (i, v.toSeq) } ==
      local.top.map { case (i, v) => (i, v.toSeq) },
      "top level diverged — the full-prefix top sample must reproduce " +
        "the driver-local lloydLocal exactly")
    assert(dist.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap ==
      local.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap,
      "sub level diverged — per-cell executor training must reproduce " +
        "the driver-local refinement bit for bit")
    // and the distributed path is itself layout-deterministic
    val dist2 = Similarity.trainHierQuantizerDistributed(
      corpus.repartition(7), nCells = 36, sampleBudget = 200,
      topBudget = 4096)
    assert(dist2.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap ==
      dist.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap,
      "distributed training depends on the input layout")
  }

  test("trainHierQuantizerDistributed at a bounded top budget still " +
       "trains a usable quantizer without any corpus-sized collect") {
    val corpus = (0L until 800L).map(i => (i, vec(12)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    // 4·nCells = 256 > topBudget = 64: the top level trains on the 64
    // lowest-hash rows only — the regime where the driver-local fit's
    // collect stops scaling. The result must be deterministic and cover
    // a sensible number of cells.
    val hq = Similarity.trainHierQuantizerDistributed(corpus, nCells = 64,
      sampleBudget = 64, topBudget = 64)
    val hq2 = Similarity.trainHierQuantizerDistributed(corpus, nCells = 64,
      sampleBudget = 64, topBudget = 64)
    assert(hq.nCells > 8, s"bounded-top training collapsed: ${hq.nCells}")
    assert(hq.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap ==
      hq2.sub.view.mapValues(_.map { case (g, v) =>
        (g, v.toSeq) }).toMap,
      "bounded-top training lost determinism")
    // global ids stay in each top cell's [c1·k2, c1·k2 + k2) slot range
    hq.sub.foreach { case (c1, scs) =>
      scs.foreach { case (g, _) =>
        assert(g >= c1 * hq.k2 && g < (c1 + 1) * hq.k2,
          s"global id $g escaped top cell $c1's slot range")
      }
    }
  }

  test("adaptive probe's plan-bounded cellsizes path is row-identical " +
       "to the literal path and keeps the sizes out of the plan " +
       "(r13/r14 verdict carry)") {
    import org.apache.spark.sql.functions._
    val corpus = (0L until 300L).map(i => (i, vec(16)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val quant = Similarity.trainHierQuantizer(corpus, nCells = 25,
      sampleBudget = 300)
    val nbrs = corpus.select($"vec_id".as("nbr_id"),
      $"embedding".as("nbr_vec"))
    val sizes = Similarity.assignCellsHier(nbrs, quant, "nbr_vec")
      .groupBy("cell_id").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val qs = corpus.limit(9).select($"vec_id".as("query_id"),
      $"embedding".as("q_vec"))
    val lits = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 3,
      minCandidates = 20L, cellSizes = sizes)
    val bounded = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 3,
      minCandidates = 20L, cellSizes = sizes, maxSizeLiteralLongs = 0L)
    assert(lits.exceptAll(bounded).isEmpty && bounded.exceptAll(lits).isEmpty,
      "adaptive prefix cut diverged between literal and broadcast paths")
    // plan witnesses: the literal path embeds the aggregate-HOF prefix
    // walk over the sizes array literal; the bounded path must NOT (the
    // sizes ride a broadcast variable inside one deterministic function)
    assert(lits.queryExecution.executedPlan.toString.contains("aggregate("),
      "literal path lost its aggregate-HOF cut — ceiling misrouted?")
    val boundedPlan = bounded.queryExecution.executedPlan.toString
    assert(!boundedPlan.contains("aggregate("),
      "bounded path still embeds the literal prefix walk")
    assert(boundedPlan.contains("UDF"),
      "bounded path must cut via the broadcast-variable function")
    // edge: minCandidates larger than the whole reach keeps every cell
    // on both paths
    val litAll = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 2,
      minCandidates = 100000L, cellSizes = sizes)
    val bndAll = Similarity.probeCellsHierAdaptive(qs, quant, "q_vec", 2,
      minCandidates = 100000L, cellSizes = sizes, maxSizeLiteralLongs = 0L)
    assert(litAll.exceptAll(bndAll).isEmpty && bndAll.exceptAll(litAll).isEmpty,
      "exhaustive-cut edge diverged between paths")
  }
}
