package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import scala.util.chaining._

/**
 * Iterative whole-graph analytics over edge DataFrames — the
 * beyond-reference complement to the knowledge-graph traversals in
 * [[PathQueries]] (which answer per-start-node questions; these rank the
 * graph globally).
 *
 * Scale rules follow [[Dedup.connectedComponents]]: the edge table is
 * the dominant volume, so it is pre-partitioned on the per-round join
 * key ONCE (AQE-off capture so localCheckpoint records the
 * partitioning) and never re-shuffles; each round moves only
 * rank-sized (|V|) rows plus the map-side-combined contribution
 * aggregation.
 */
object GraphAlgos {

  /** In-neighbor sum for one iteration round. `exact = true` folds the
    * neighbor-SORTED contribution list — bit-stable across engines and
    * runs (the oracle-gate contract), but it materializes one array per
    * node via collect_list, which a celebrity node (100M in-edges at
    * corpus scale) turns into a single giant group. `exact = false` is
    * the 100 TB path: a plain codegen'd sum with map-side partial
    * aggregation — no arrays, same values up to float-addition
    * association (spec-pinned ≤1e-12 relative on the gates' graphs).
    * The family DEFAULTS to the fast path — production callers get
    * map-side combine unless they opt into the bit-exact face (gates
    * and cross-engine replay do; nothing else should). */
  private def neighborSum(sortKey: org.apache.spark.sql.Column,
                          v: org.apache.spark.sql.Column,
                          exact: Boolean): org.apache.spark.sql.Column =
    if (exact)
      aggregate(sort_array(collect_list(struct(sortKey.as("k"), v.as("v")))),
        lit(0.0), (acc, x) => acc + x.getField("v"))
    else sum(v)

  /** Static PageRank, GraphX convention: ranks start at 1.0 and iterate
    * `pr'(v) = (1−d) + d·Σ_{u→v} pr(u)/outdeg(u)` for a FIXED number of
    * rounds, with no dangling-mass redistribution (nodes without
    * out-edges absorb rank; Spark GraphX's staticPageRank does the
    * same). Edges are deduplicated first, so parallel edges contribute
    * once.
    *
    * Determinism: each in-neighbor sum folds over the SOURCE-sorted
    * contribution list and every remaining operation is IEEE +,·,/
    * (`1−d` is computed as the same IEEE subtraction any engine
    * evaluates, never a pre-rounded literal), so a fixed iteration
    * count replays bit-identically anywhere — the q98 gate
    * hash-compares all five rounds' fixpoint against DuckDB's unrolled
    * recursion cell-exact.
    *
    * Shape at 100 TB: the distinct'd edge table partitions on src once
    * and its out-degree table inherits that partitioning (partial agg,
    * no exchange); each round shuffles the |V|-sized rank table to the
    * edge partitioning for the src join, then the contributions
    * aggregate on dst with map-side combine. The per-round cost is two
    * |V|-shuffles + one map-combined |E| aggregation — never a
    * re-shuffle of the edge table itself (plan-asserted in
    * GraphAlgosSpec). */
  def pageRank(edges0: DataFrame, iterations: Int = 5,
               damping: Double = 0.85, srcCol: String = "src",
               dstCol: String = "dst",
               exactFolds: Boolean = false): DataFrame =
    run(edges0, None, iterations, damping, srcCol, dstCol, None, exactFolds)

  /** Weighted PageRank: each edge carries `weightCol` and u's rank
    * splits over out-edges proportionally — contribution
    * `pr(u)·(w(u,v)/W(u))` with `W(u) = Σ out-weights`. Precondition:
    * (src, dst) pairs are UNIQUE in `edges0` (pre-aggregate parallel
    * edges; the unweighted faces dedup internally, this one cannot
    * without guessing a combine rule). Same determinism contract
    * (sorted folds, IEEE ops — gate q103) and shuffle shape. */
  def weightedPageRank(edges0: DataFrame, iterations: Int = 5,
                       damping: Double = 0.85, srcCol: String = "src",
                       dstCol: String = "dst",
                       weightCol: String = "w",
                       exactFolds: Boolean = false): DataFrame =
    run(edges0, None, iterations, damping, srcCol, dstCol, Some(weightCol),
      exactFolds)

  /** Personalized PageRank: the reset mass lands ONLY on the `seeds`
    * node set (init 1 on seeds, 0 elsewhere; per-round base
    * `(1−d)·1{v ∈ seeds}`), so ranks measure proximity to the seeds —
    * the "entities related to X" query over a knowledge graph. Same
    * determinism and shuffle shape as [[pageRank]]; gate q99 replays it
    * against the q98 oracle family with a seeded base term. */
  def personalizedPageRank(edges0: DataFrame, seeds: DataFrame,
                           iterations: Int = 5, damping: Double = 0.85,
                           srcCol: String = "src", dstCol: String = "dst",
                           seedCol: String = "node",
                           exactFolds: Boolean = false): DataFrame =
    run(edges0, Some(seeds.select(col(seedCol).as("node")).distinct()),
      iterations, damping, srcCol, dstCol, None, exactFolds)

  /** HITS hubs & authorities (Kleinberg 1999): `iterations` rounds of
    * `auth(v) = Σ_{u→v} hub(u)` then `hub(v) = Σ_{v→w} auth(w)`, hubs
    * initialized to 1. UNNORMALIZED by default — the per-round scaling
    * divides both vectors by a scalar, so it factors out of the ranking
    * entirely, and skipping it keeps every operation IEEE +,· with
    * neighbor-sorted folds (gate q102 replays cell-exact in DuckDB);
    * `normalize = true` divides each final vector by its max (max is
    * fold-order-free, division exact). Values grow ≤ maxdeg^(2·rounds):
    * keep rounds small or normalize for degree-billions graphs.
    *
    * `weightCol` turns each contribution into `w(u,v)·hub(u)` /
    * `w(v,w)·auth(w)` (weighted HITS). Precondition as in
    * [[weightedPageRank]]: (src, dst) pairs UNIQUE in `edges0` — the
    * unweighted face dedups internally, the weighted one cannot without
    * guessing a combine rule. Per-term multiplication is IEEE-exact and
    * order-free, so the weighted face keeps the same determinism
    * contract (gate q112).
    *
    * Shape at 100 TB: TWO checkpointed edge copies — partitioned by src
    * (hub phase) and by dst (auth phase), the hop-table trick — so
    * neither phase ever re-shuffles edges; each phase is one |V|-sized
    * rank join + one map-side-combined aggregation. */
  def hits(edges0: DataFrame, iterations: Int = 4,
           srcCol: String = "src", dstCol: String = "dst",
           normalize: Boolean = false,
           weightCol: Option[String] = None,
           exactFolds: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    val (eBySrc, eByDst) = Dedup.withAqeOff(spark) {
      val e = weightCol match {
        case None =>
          edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            lit(1.0).as("__w")).distinct()
        case Some(w) =>
          edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(w).cast("double").as("__w"))
      }
      (e.pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src"))).localCheckpoint(true),
        e.pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("dst"))).localCheckpoint(true))
    }
    // loop at the static frames' size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, eBySrc.rdd.getNumPartitions) {
    val nodes = eBySrc.select(col("src").as("node"))
      .union(eBySrc.select(col("dst")))
      .distinct()
      .localCheckpoint(true)
    var hubs = nodes.withColumn("hub", lit(1.0))
    var auths = nodes.withColumn("auth", lit(0.0))
    // initial hubs/auths share the `nodes` checkpoint (never released);
    // loop rounds release their predecessor once the successor lands
    var prevHubs: DataFrame = null
    var prevAuths: DataFrame = null
    for (_ <- 1 to iterations) {
      val aSums = eBySrc.join(hubs, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(neighborSum(col("src"), col("__w") * col("hub"),
          exactFolds).as("s"))
      auths = nodes.join(aSums, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("auth"))
        .localCheckpoint(true)
      if (prevAuths != null) Exec.releaseCheckpoint(prevAuths)
      prevAuths = auths
      val hSums = eByDst.join(auths, col("dst") === col("node"))
        .groupBy(col("src").as("node"))
        .agg(neighborSum(col("dst"), col("__w") * col("auth"),
          exactFolds).as("s"))
      hubs = nodes.join(hSums, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("hub"))
        .localCheckpoint(true)
      if (prevHubs != null) Exec.releaseCheckpoint(prevHubs)
      prevHubs = hubs
    }
    val out = hubs.join(auths, "node")
    if (!normalize) out
    else {
      val m = out.agg(max(col("hub")).as("__mh"), max(col("auth")).as("__ma"))
      out.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("__mh") > 0, col("hub") / col("__mh"))
            .otherwise(col("hub")).as("hub"),
          when(col("__ma") > 0, col("auth") / col("__ma"))
            .otherwise(col("auth")).as("auth"))
    }
    } // withShuffleParts
  }

  /** Eigenvector centrality by power iteration: `iterations` rounds of
    * `x'(v) = Σ_{u→v} w(u,v)·x(u)`, renormalized by the round MAX (not
    * the L2 norm: max is fold-order-free and the division IEEE-exact,
    * so a fixed round count replays bit-identically in any engine —
    * gate q113's unrolled-recursion oracle). Unweighted edges dedup
    * and weigh 1; `weightCol` requires unique (src, dst) pairs as in
    * the weighted PageRank/HITS faces. Nodes with no in-edges fix at
    * 0, as eigenvector centrality defines (use [[pageRank]] when
    * every node needs base mass).
    *
    * Shape at 100 TB: the edge table pre-partitions on src once and
    * never re-shuffles; each round is one |V|-sized rank join + one
    * map-side-combined dst aggregation + a 1-row max broadcast. */
  def eigenvectorCentrality(edges0: DataFrame, iterations: Int = 5,
                            srcCol: String = "src", dstCol: String = "dst",
                            weightCol: Option[String] = None,
                            exactFolds: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      val e = weightCol match {
        case None =>
          edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            lit(1.0).as("__w")).distinct()
        case Some(w) =>
          edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(w).cast("double").as("__w"))
      }
      e.pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src"))).localCheckpoint(true)
    }
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
      .localCheckpoint(true)
    var x = nodes.withColumn("score", lit(1.0))
    // initial x shares the `nodes` checkpoint (never released); loop
    // rounds release their predecessor once the successor lands
    var prevX: DataFrame = null
    for (_ <- 1 to iterations) {
      val sums = edges.join(x, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(neighborSum(col("src"), col("__w") * col("score"),
          exactFolds).as("s"))
      val raw = nodes.join(sums, Seq("node"), "left")
        .select(col("node"), coalesce(col("s"), lit(0.0)).as("score"))
      val m = raw.agg(max(col("score")).as("__m"))
      x = raw.crossJoin(broadcast(m))
        .select(col("node"),
          when(col("__m") > 0, col("score") / col("__m"))
            .otherwise(col("score")).as("score"))
        .localCheckpoint(true)
      if (prevX != null) Exec.releaseCheckpoint(prevX)
      prevX = x
    }
    x
    } // withShuffleParts
  }

  /** Multi-source BFS shortest paths (GraphX ShortestPaths analog):
    * hop distance from every `landmarks` node to every node it reaches
    * along edge direction, capped at `maxHops`. Returns (node,
    * landmark, dist) — pure integer arithmetic, so the q104 gate is
    * trivially exact in any engine.
    *
    * Shape at 100 TB: the frontier is (reached × landmarks)-sized and
    * min-combines per round with map-side partial aggregation; the edge
    * table pre-partitions on src once and never re-shuffles (the
    * frontier joins it on its partitioning key). Rounds stop early the
    * moment no distance improves — each round is ONE job (the
    * [[Dedup.connectedComponents]] pattern), and the improvement count
    * rides the round's own checkpoint action as a codegen'd
    * `Dataset.observe` metric, so the whole round stays inside
    * whole-stage codegen (no per-row JVM lambda, no second pass). */
  def shortestPaths(edges0: DataFrame, landmarks: DataFrame,
                    maxHops: Int = 6, srcCol: String = "src",
                    dstCol: String = "dst",
                    landmarkCol: String = "node"): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    shortestPathsPrepped(edges, landmarks, maxHops, landmarkCol)
  }

  /** [[shortestPaths]] over an ALREADY-PREPARED edge frame — distinct
    * (src, dst), src-partitioned, checkpointed. For composing callers
    * ([[betweenness]]) that hold such a frame and would otherwise pay
    * a second identical distinct+shuffle+checkpoint pass and pin a
    * redundant copy of the edge set. */
  private[graft] def shortestPathsPrepped(edges: DataFrame,
                                          landmarks: DataFrame,
                                          maxHops: Int,
                                          landmarkCol: String): DataFrame = {
    // loop at the prepped frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(edges.sparkSession, edges.rdd.getNumPartitions) {
    var dists = landmarks
      .select(col(landmarkCol).as("node")).distinct()
      .select(col("node"), col("node").as("landmark"), lit(0).as("dist"))
      .localCheckpoint(true)
    var hop = 0
    var changed = true
    while (changed && hop < maxHops) {
      val (updated, obs) = spRound(edges, dists)
      val prevDists = dists // own checkpoint (incl. round 0): releasable
      dists = Exec.checkpointCut(updated)
      Exec.releaseCheckpoint(prevDists)
      changed = obs.get("improved").asInstanceOf[Long] > 0
      hop += 1
    }
    dists
    } // withShuffleParts
  }

  /** One shortest-paths round: frontier-extend along edges, min-combine
    * with known distances, and observe the improvement count (a
    * (node, landmark) pair improves when the new min beats every
    * previously-known distance; `old` is null for first-reached pairs).
    * The observation resolves when the caller's action on the returned
    * frame completes — no extra job, no row-typed lambda (spec-asserted:
    * the round plan contains no DeserializeToObject). */
  private[graft] def spRound(edges: DataFrame, dists: DataFrame)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val step = edges.join(dists, col("src") === col("node"))
      .select(col("dst").as("node"), col("landmark"),
        (col("dist") + 1).as("dist"), lit(null).cast("int").as("old"))
    val merged = dists.withColumn("old", col("dist"))
      .unionByName(step)
      .groupBy("node", "landmark")
      .agg(min(col("dist")).as("dist"), min(col("old")).as("old"))
    val obs = org.apache.spark.sql.Observation()
    val updated = merged
      .observe(obs, count(when(col("old").isNull ||
        col("dist") < col("old"), 1)).as("improved"))
      .select("node", "landmark", "dist")
    (updated, obs)
  }

  /** WEIGHTED multi-source shortest paths: bounded-round distributed
    * Bellman-Ford (min-plus relaxation) from every `landmarks` node
    * along edge direction, with NON-NEGATIVE integer edge weights
    * (`weightCol`; parallel (src, dst) edges combine by MIN weight —
    * the only sound rule for shortest paths). Returns (node, landmark,
    * dist) — pure integer arithmetic, so the q132 gate replays
    * cell-exactly in any engine (the oracle unrolls the same
    * `maxRounds` min-combine rounds; post-convergence rounds are
    * no-ops, so the two bounds cannot drift).
    *
    * Rounds needed = the hop count of the longest shortest PATH (not
    * the weighted diameter) — with non-negative weights every round
    * strictly improves some (node, landmark) pair until the fixpoint,
    * and `requireConverged` fails fast if `maxRounds` was too small
    * rather than returning non-minimal distances (the [[kCore]]
    * convention). Negative weights are the caller's responsibility:
    * Bellman-Ford relaxation stays correct, but a reachable negative
    * cycle never converges and trips the same fail-fast.
    *
    * Shape at 100 TB: identical to [[shortestPaths]] — the weighted
    * edge table pre-partitions on src ONCE (AQE-off capture) and never
    * re-shuffles; each round is one frontier join + one
    * map-side-combined min aggregation, with the improvement count
    * riding the round's own checkpoint action as a `Dataset.observe`
    * metric (one job per round, no second pass). */
  def weightedShortestPaths(edges0: DataFrame, landmarks: DataFrame,
                            maxRounds: Int = 16, srcCol: String = "src",
                            dstCol: String = "dst",
                            weightCol: String = "w",
                            landmarkCol: String = "node",
                            requireConverged: Boolean = true): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(weightCol).cast("long").as("__w"))
        .groupBy("src", "dst").agg(min(col("__w")).as("__w"))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    var dists = landmarks
      .select(col(landmarkCol).as("node")).distinct()
      .select(col("node"), col("node").as("landmark"),
        lit(0L).as("dist"))
      .localCheckpoint(true)
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val step = edges.join(dists, col("src") === col("node"))
        .select(col("dst").as("node"), col("landmark"),
          (col("dist") + col("__w")).as("dist"),
          lit(null).cast("long").as("old"))
      val merged = dists.withColumn("old", col("dist"))
        .unionByName(step)
        .groupBy("node", "landmark")
        .agg(min(col("dist")).as("dist"), min(col("old")).as("old"))
      val obs = org.apache.spark.sql.Observation()
      val updated = merged
        .observe(obs, count(when(col("old").isNull ||
          col("dist") < col("old"), 1)).as("improved"))
        .select("node", "landmark", "dist")
      val prevDists = dists
      dists = Exec.checkpointCut(updated)
      Exec.releaseCheckpoint(prevDists)
      changed = obs.get("improved").asInstanceOf[Long] > 0
      round += 1
    }
    require(!requireConverged || !changed,
      s"weighted shortest paths did not converge within $maxRounds " +
        "rounds (long shortest-path hop chains or a negative cycle — " +
        "raise maxRounds or check weights)")
    dists
    } // withShuffleParts
  }

  /** Per-node triangle counts over the UNDIRECTED graph underlying
    * `edges0` (direction and parallel edges collapse; self-loops drop).
    * Returns (node, n_triangles) for every node in at least one
    * triangle — integer-exact, so the q106 gate replays in any engine.
    *
    * Shape at 100 TB: edges orient from the LOWER (degree, id) endpoint
    * to the higher before the wedge join — the standard bound (each
    * out-neighborhood ≤ O(√m)), so the wedge intermediate is
    * Σ outdeg² = O(m^1.5) instead of Σ deg² (which a single hub makes
    * quadratic). Two equi-joins: wedges meet on the middle vertex, then
    * close against the oriented edge set on (first, last); per-node
    * counts are one map-side-combined explode+aggregate over the
    * triangle list. */
  def triangleCounts(edges0: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst"): DataFrame = {
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient from lower (degree, id) to higher: a hub never fans out
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), "v")
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("b"))
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedges.join(
      oriented.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  private def run(edges0: DataFrame, seedsOpt: Option[DataFrame],
                  iterations: Int, damping: Double,
                  srcCol: String, dstCol: String,
                  weightCol: Option[String],
                  exactFolds: Boolean): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      val sel = weightCol match {
        case Some(w) => edges0.select(col(srcCol).as("src"),
          col(dstCol).as("dst"), col(w).as("__w"))
        case None => edges0.select(col(srcCol).as("src"),
          col(dstCol).as("dst")).distinct()
      }
      sel.pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src"))).localCheckpoint(true)
    }
    // loop at the static frame's size-derived count: co-partitions every
    // per-round rank frame with the edges (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    // out-degree (or out-weight total): partial agg over the
    // src-partitioned edges — no exchange
    val deg = weightCol match {
      case Some(_) => edges.groupBy("src").agg(sum(col("__w")).as("deg"))
      case None => edges.groupBy("src").agg(count(lit(1)).as("deg"))
    }
    val allNodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst")))
      .distinct()
    // IEEE 1−d, same bits any engine computes — never a rounded literal
    val oneMinusD = 1.0 - damping
    val nodes = (seedsOpt match {
      case Some(sd) => allNodes
        .join(sd.withColumn("__seed", lit(true)), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__seed"), lit(false)).as("__seed"))
      case None => allNodes.withColumn("__seed", lit(true))
    }).localCheckpoint(true)
    val base = when(col("__seed"), lit(oneMinusD)).otherwise(lit(0.0))
    var ranks = nodes
      .select(col("node"),
        when(col("__seed"), lit(1.0)).otherwise(lit(0.0)).as("pr"))
    // round N's checkpoint is dead once round N+1 materializes; released
    // below so long runs hold ONE |V| rank copy, not `iterations` copies.
    // (The initial ranks frame shares the `nodes` checkpoint and must
    // never be released — tracked via prevRanks = null for round 1.)
    var prevRanks: DataFrame = null
    for (_ <- 1 to iterations) {
      val contribution = weightCol match {
        // weighted: pr·(w/W) — two IEEE ops, mirrored in the oracle
        case Some(_) => col("pr") *
          (col("__w").cast("double") / col("deg").cast("double"))
        case None => col("pr") / col("deg").cast("double")
      }
      val contribs = edges
        .join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), col("src"), contribution.as("c"))
      val sums = contribs.groupBy(col("dst").as("node"))
        .agg(neighborSum(col("src"), col("c"), exactFolds).as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      if (prevRanks != null) Exec.releaseCheckpoint(prevRanks)
      prevRanks = ranks
    }
    ranks
    } // withShuffleParts
  }

  /** k-core: the maximal subgraph of the UNDIRECTED graph underlying
    * `edges0` in which every node keeps degree ≥ k. Iterative peeling:
    * each round drops every node whose degree over the SURVIVING edge
    * set falls below k, until a round removes nothing. Returns
    * (node, deg) for the k-core members with their in-core degrees —
    * integer-exact end to end, so the q116 gate replays the peel
    * rounds cell-exactly in DuckDB (unrolled-round CTEs; extra rounds
    * past convergence are no-ops, so the oracle just over-unrolls).
    *
    * Shape at 100 TB: the adjacency (both orientations of each
    * undirected edge) partitions on `node` once (AQE-off capture);
    * per-round degrees are a partial agg over that partitioning (no
    * exchange) whose sub-k output — the removal set — is fringe-sized
    * after the first round and is checkpointed per round (a tiny
    * second job). The two endpoint anti-joins run with AQE on: a small
    * removal set auto-broadcasts, so steady-state rounds never
    * re-shuffle the adjacency; a rare mass-removal round (e.g. the
    * first, when most of the graph sits below k) degrades to one
    * adjacency shuffle instead of overflowing a broadcast. The
    * convergence check rides the round's checkpoint action as a
    * `Dataset.observe` row count (adjacency strictly shrinks iff the
    * round peeled something) — no extra pass.
    *
    * Parallel peeling needs one round per fringe "layer"; a path graph
    * peels O(n) layers at k = 2, so `maxRounds` caps the loop and, by
    * default, non-convergence fails fast rather than returning a
    * superset that is not a k-core. */
  def kCore(edges0: DataFrame, k: Int, maxRounds: Int = 64,
            srcCol: String = "src", dstCol: String = "dst",
            requireConverged: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val obs0 = org.apache.spark.sql.Observation()
    var adj = Dedup.withAqeOff(spark) {
      und.select(col("u").as("node"), col("v").as("nbr"))
        .union(und.select(col("v"), col("u")))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("node")))
        .observe(obs0, count(lit(1)).as("rows"))
        .localCheckpoint(true)
    }
    // The eager checkpoint already scanned every row; the observation
    // hands us the seed count for free instead of a second full pass.
    var prevRows = obs0.get("rows").asInstanceOf[Long]
    Exec.withShuffleParts(spark, adj.rdd.getNumPartitions) {
    var changed = prevRows > 0L
    var round = 0
    while (changed && round < maxRounds) {
      val prevAdj = adj
      val removed = Exec.checkpointCut(
        adj.groupBy("node").agg(count(lit(1)).as("deg"))
          .filter(col("deg") < k)
          .select("node"))
      val obs = org.apache.spark.sql.Observation()
      adj = Exec.checkpointCut(adj
        .join(removed, Seq("node"), "left_anti")
        .join(removed.select(col("node").as("nbr")), Seq("nbr"), "left_anti")
        .select("node", "nbr")
        .observe(obs, count(lit(1)).as("rows")))
      // The new round's checkpoint is materialized (eager), so the
      // previous adjacency copy and this round's removal set are dead —
      // free their blocks now rather than letting maxRounds copies of
      // the 2|E| working set pile up in the block manager.
      Exec.releaseCheckpoint(prevAdj, removed)
      val rows = obs.get("rows").asInstanceOf[Long]
      changed = rows < prevRows && rows > 0L
      prevRows = rows
      round += 1
    }
    require(!requireConverged || !changed,
      s"k-core peeling did not converge within $maxRounds rounds " +
        "(deep fringe layers — raise maxRounds)")
    adj.groupBy("node").agg(count(lit(1)).as("deg"))
    } // withShuffleParts
  }

  /** k-shell (onion) decomposition: every node's CORE NUMBER —
    * shell(v) = the largest k with v in the k-core — where [[kCore]]
    * answers one k, this peels the whole onion: k walks up from 1 and
    * each level's cascade removes the nodes whose degree in the
    * REMAINING graph falls below k, assigning them shell k−1 (the
    * standard equivalence: removed while building the k-core ⇔ in the
    * (k−1)-core but not the k-core). Incremental — level k peels the
    * (k−1)-core, never the full graph — and integer-exact, so the
    * q156 gate replays cell-for-cell against the oracle's per-k
    * full-graph peels (shell = max k with membership; same function,
    * independently computed shapes).
    *
    * Shape at 100 TB: the [[kCore]] loop contract per level —
    * map-side-combined degree census, two anti-joins against the
    * removal set, eager checkpoint with the row count riding
    * `Dataset.observe`, predecessor blocks freed each round. Total
    * rounds = Σ per-level cascade depths (the onion's layering), each
    * bounded by `maxRounds` and the level count by `maxK`, both
    * fail-fast. */
  def kShell(edges0: DataFrame, srcCol: String = "src",
             dstCol: String = "dst", maxK: Int = 16, maxRounds: Int = 16,
             requireConverged: Boolean = true): DataFrame = {
    require(maxK >= 1, "maxK must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var adj = Dedup.withAqeOff(spark) {
      und.select(col("u").as("node"), col("v").as("nbr"))
        .union(und.select(col("v"), col("u")))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("node")))
        .localCheckpoint(true)
    }
    // loop at the adjacency's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, adj.rdd.getNumPartitions) {
    // nodes are tracked EXPLICITLY: a node whose neighbors are all
    // removed mid-cascade vanishes from the adjacency (zero rows), so
    // "absent from the degree census" must read as degree 0 — removed
    // — not as "already gone"
    val obsN0 = org.apache.spark.sql.Observation()
    var nodes = adj.select("node").distinct()
      .observe(obsN0, count(lit(1)).as("n"))
      .localCheckpoint(true)
    var nActive = obsN0.get("n").asInstanceOf[Long]
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 1
    while (nActive > 0L && k <= maxK) {
      var cascading = true
      var round = 0
      // hard-bounded even with requireConverged = false: a partial
      // cascade then reports UPPER-BOUND shells (documented), never an
      // unbounded driver loop
      while (cascading && nActive > 0L && round < maxRounds) {
        val keep = adj.groupBy("node").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select("node")
        val obsD = org.apache.spark.sql.Observation()
        val removed = Exec.checkpointCut(
          nodes.join(keep, Seq("node"), "left_anti")
            .select(col("node"), lit((k - 1).toLong).as("shell"))
            .observe(obsD, count(lit(1)).as("n")))
        if (obsD.get("n").asInstanceOf[Long] == 0L) {
          Exec.releaseCheckpoint(removed)
          cascading = false
        } else {
          parts += removed
          val prevAdj = adj
          val prevNodes = nodes
          val obsK = org.apache.spark.sql.Observation()
          nodes = Exec.checkpointCut(
            nodes.join(removed.select("node"), Seq("node"), "left_anti")
              .observe(obsK, count(lit(1)).as("n")))
          adj = Exec.checkpointCut(adj
            .join(removed.select("node"), Seq("node"), "left_anti")
            .join(removed.select(col("node").as("nbr")), Seq("nbr"),
              "left_anti")
            .select("node", "nbr"))
          Exec.releaseCheckpoint(prevAdj, prevNodes)
          nActive = obsK.get("n").asInstanceOf[Long]
          round += 1
        }
      }
      require(!requireConverged || !cascading || nActive == 0L,
        s"k-shell cascade at level $k exceeded $maxRounds rounds " +
          "(deep fringe layers — raise maxRounds)")
      k += 1
    }
    require(!requireConverged || nActive == 0L,
      s"k-shell did not exhaust the graph by level $maxK " +
        "(degeneracy >= maxK — raise maxK)")
    Exec.releaseCheckpoint(adj, nodes)
    if (parts.isEmpty)
      und.select(col("u").as("node"), lit(0L).as("shell")).limit(0)
    else {
      val out = parts.reduce(_ unionByName _).localCheckpoint(true)
      Exec.releaseCheckpoint(parts.toSeq: _*)
      out
    }
    } // withShuffleParts
  }

  /** Link prediction over the undirected graph underlying `edges0`:
    * scores every non-adjacent node pair (u, v) at distance 2 by the
    * classic neighborhood indices — common-neighbor count `cn`,
    * Jaccard `cn / (deg(u) + deg(v) − cn)`, and the Resource
    * Allocation index `ra = Σ_{z ∈ CN(u,v)} 1/deg(z)` (Zhou et al.
    * 2009 — the ln-free member of the Adamic-Adar family, chosen for
    * the same reason the BM25 gate uses rational idf: no
    * transcendental whose last bit could differ across engines).
    * Returns (u, v, cn, jaccard, ra) with u < v.
    *
    * Determinism: cn and the Jaccard numerator/denominator are
    * integers; jaccard is ONE final IEEE division; `ra` folds the
    * middle-vertex-SORTED 1/deg list when `exactFolds` (the gate/
    * cross-engine face — q128), else a plain codegen'd sum with
    * map-side combine (the production default, same convention as
    * [[pageRank]]).
    *
    * Shape at 100 TB: wedges enumerate through the middle vertex z —
    * one self-join of the adjacency on z, so the intermediate is
    * Σ deg(z)², which a celebrity middle makes quadratic. The
    * DISTANCE-2 OUTPUT ITSELF is quadratic around hubs (every pair of
    * a hub's neighbors is a candidate), so at corpus scale callers
    * bound the problem, not the engine trick: `maxMidDegree` drops
    * middles above a degree cap (the standard production guard — a
    * 10M-degree hub's wedge set carries no signal for any single
    * pair), and `minCommon` prunes the long single-wedge tail at the
    * map-side-combined aggregate. Degrees join the adjacency before
    * the self-join (partial agg on the same key, no extra exchange);
    * the existing-edge anti-join runs on the already-partitioned
    * (u, v) pair key. */
  def linkPrediction(edges0: DataFrame, srcCol: String = "src",
                     dstCol: String = "dst", minCommon: Int = 1,
                     maxMidDegree: Option[Int] = None,
                     excludeExisting: Boolean = true,
                     exactFolds: Boolean = false): DataFrame = {
    require(minCommon >= 1, "minCommon must be >= 1")
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val adj = und.select(col("u").as("z"), col("v").as("x"))
      .union(und.select(col("v"), col("u")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
    val mid = (maxMidDegree match {
      case Some(cap) => adj.join(deg.filter(col("d") <= cap), "z")
      case None => adj.join(deg, "z")
    })
    val wedges = mid.select(col("z"), col("x").as("u"), col("d"))
      .join(mid.select(col("z"), col("x").as("v")), "z")
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy("u", "v")
      .agg(count(lit(1)).as("cn"),
        neighborSum(col("z"), lit(1.0) / col("d").cast("double"),
          exactFolds).as("ra"))
      .filter(col("cn") >= minCommon)
    val out = scored
      .join(deg.select(col("z").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("z").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"),
        (col("cn").cast("double") /
          (col("du") + col("dv") - col("cn")).cast("double")).as("jaccard"),
        col("ra"))
    if (excludeExisting) out.join(und, Seq("u", "v"), "left_anti") else out
  }

  /** Harmonic centrality from a LANDMARK SAMPLE (the Eppstein-Wang
    * estimator family): `h(v) = Σ_{u ∈ landmarks, u ≠ v, u→v reachable}
    * 1/d(u, v)` with BFS distances capped at `maxHops` — the
    * centrality that stays well-defined on disconnected graphs
    * (unreachable sources contribute 0, not ∞ like closeness).
    * Returns (node, n_sources, h_scaled) where `h_scaled` =
    * h(v) · lcm(1..maxHops) as an EXACT integer — every 1/d is
    * represented as lcm div d (an int64, since d | lcm), so the sum is
    * pure int64 arithmetic: order-free, overflow-safe up to
    * |landmarks|·lcm < 2^63 (not the 2^53 a double fold would cap at),
    * and the q129 gate replays cell-exactly in any engine; callers
    * wanting the float face divide by [[harmonicScale]].
    *
    * Shape at 100 TB: delegates the whole traversal to
    * [[shortestPaths]] (frontier min-combine, edges partitioned once,
    * one job per round); the final aggregate is one map-side-combined
    * |reached × landmarks| → |V| reduction. Exact all-pairs harmonic
    * centrality is O(V·E) — at corpus scale the landmark sample IS
    * the estimator (scale `h_scaled` by |V|/|landmarks| for the
    * population estimate); on a bounded subgraph pass every node as a
    * landmark for the exact value. */
  def harmonicCentrality(edges0: DataFrame, landmarks: DataFrame,
                         maxHops: Int = 6, srcCol: String = "src",
                         dstCol: String = "dst",
                         landmarkCol: String = "node"): DataFrame = {
    val lcm = harmonicScale(maxHops)
    // lcm div d is exact int64 (d | lcm), so the sum is long-typed end
    // to end — associative, fold-order-free under map-side combine, and
    // immune to the 2^53 integer ceiling a double-typed sum would hit
    shortestPaths(edges0, landmarks, maxHops, srcCol, dstCol, landmarkCol)
      .filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_sources"),
        sum(expr(s"${lcm}L div dist")).as("h_scaled"))
  }

  /** Closeness centrality from landmark distances — the reciprocal-
    * of-total-distance cousin of [[harmonicCentrality]] (which is the
    * better-behaved variant on disconnected graphs; this one exists
    * because tooling expects it): c(v) = n_sources / Σd over landmarks
    * that reach v within `maxHops`, ONE division of exact integers per
    * node. Same BFS machinery, same shuffle shape. */
  def closenessCentrality(edges0: DataFrame, landmarks: DataFrame,
                          maxHops: Int = 6, srcCol: String = "src",
                          dstCol: String = "dst",
                          landmarkCol: String = "node"): DataFrame =
    shortestPaths(edges0, landmarks, maxHops, srcCol, dstCol, landmarkCol)
      .filter(col("dist") > 0)
      .groupBy("node")
      .agg(count(lit(1)).as("n_sources"), sum(col("dist")).as("dist_sum"))
      .withColumn("closeness",
        col("n_sources").cast("double") / col("dist_sum").cast("double"))

  /** Effective diameter from landmark BFS distances: the pct-th
    * percentile (type-1 lower selection, the [[Stats.exactQuartiles]]
    * rule — no interpolation) of all positive landmark→node hop
    * distances, plus the exact mean distance (one division). The
    * landmark-sample estimator is the standard scalable face
    * (Leskovec et al. 2005's effective-diameter convention, here
    * rank-selected instead of interpolated).
    *
    * Emits ONE row: n_pairs, eff_diameter, mean_dist. Shape: the
    * [[shortestPaths]] BFS plus one map-side-combined HISTOGRAM over
    * the pair-distance table — hop distances are integers in
    * [1, maxHops], so the rank selection is a ≤ maxHops-bucket
    * cumulative walk on the driver, NOT a sort. The first cut
    * rank-selected with `row_number` over an unpartitioned window,
    * which funnels all |landmarks|·|V| pair rows through ONE task —
    * measured super-linear at the third decade (sf100: 32M pairs,
    * exp 1.23 vs closeness's 0.86 on the SAME BFS; PLANS.md round 10)
    * and fixed here: the histogram aggregate is value-identical
    * (selection on a sorted integer multiset ≡ cumulative-count walk)
    * and leaves only the |dist-values|-row collect. */
  def effectiveDiameter(edges0: DataFrame, landmarks: DataFrame,
      maxHops: Int = 6, pct: Int = 90, srcCol: String = "src",
      dstCol: String = "dst", landmarkCol: String = "node"): DataFrame = {
    require(pct >= 1 && pct <= 100, "pct in 1..100")
    val spark = edges0.sparkSession
    import spark.implicits._
    val hist = shortestPaths(edges0, landmarks, maxHops, srcCol, dstCol,
        landmarkCol)
      .filter(col("dist") > 0)
      .groupBy("dist").agg(count(lit(1)).as("c"))
      .select(col("dist").cast("long"), col("c"))
      .as[(Long, Long)].collect().sortBy(_._1) // ≤ maxHops buckets
    val n = hist.map(_._2).sum
    val s = hist.map { case (d, c) => d * c }.sum
    if (n == 0L)
      return Seq.empty[(Long, Int, Double)]
        .toDF("n_pairs", "eff_diameter", "mean_dist")
    val rank = (pct.toLong * (n - 1)) / 100 + 1 // type-1 lower selection
    var cum = 0L
    val eff = hist.collectFirst {
      case (d, c) if { cum += c; cum >= rank } => d
    }.get
    Seq((n, eff.toInt, s.toDouble / n.toDouble))
      .toDF("n_pairs", "eff_diameter", "mean_dist")
  }

  /** The integer scale of [[harmonicCentrality]]'s `h_scaled`:
    * lcm(1..maxHops). */
  def harmonicScale(maxHops: Int): Long = {
    require(maxHops >= 1 && maxHops <= 40, "maxHops out of range")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1L to maxHops.toLong).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
  }

  /** Betweenness centrality from a SOURCE SAMPLE — Brandes' algorithm
    * (2001) restricted to shortest paths that START at a `sources`
    * node, the standard scalable estimator (Brandes-Pich 2007: scale
    * by |V|/|sources| for the population estimate; pass every node for
    * the exact value on a bounded subgraph). Directed, hop-count
    * shortest paths, truncated at `maxHops` (k-betweenness).
    *
    * Three level-synchronized phases, each a bounded loop of
    * join+aggregate rounds — never a per-node traversal:
    *  1. BFS distances per (node, source) — [[shortestPaths]];
    *  2. path counts σ(v,s) by FORWARD DP over distance levels
    *     (σ of a level-d node = Σ σ of its level-(d−1) predecessors —
    *     integer-exact, map-side combinable);
    *  3. dependencies δ(v,s) by BACKWARD DP: δ(v) = Σ over successors
    *     w at the next level of (σ(v)/σ(w))·(1+δ(w)) — each term two
    *     IEEE ops, folded in successor-sorted order under `exactFolds`
    *     (the q136 gate face; production default is the
    *     map-side-combined sum, the [[pageRank]] convention).
    * Betweenness bc(v) = Σ_{s≠v} δ(v,s), source-sorted fold. Returns
    * every node (zeros included).
    *
    * Shape at 100 TB: the edge table pre-partitions once inside
    * [[shortestPaths]]; phases 2-3 each run ≤ maxHops rounds of one
    * (level × sources)-sized join + one map-side-combined aggregate;
    * per-level frames checkpoint and release their predecessor. The
    * (node, source) working set is |reached| · |sources| — the source
    * sample bounds it, exactly like [[harmonicCentrality]]. */
  def betweenness(edges0: DataFrame, sources: DataFrame,
                  maxHops: Int = 6, srcCol: String = "src",
                  dstCol: String = "dst", sourceCol: String = "node",
                  exactFolds: Boolean = false): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    val dist = shortestPathsPrepped(edges, sources, maxHops, sourceCol)
    // σ/δ level loops at the static frame's size-derived count
    // (Exec.withShuffleParts; shortestPathsPrepped pins its own scope)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    // forward: σ per level (σ(s,s)=1; level-d σ sums level-(d−1)
    // predecessors through edges whose head lands exactly on level d)
    var levels = Vector(dist.filter(col("dist") === 0)
      .select(col("node"), col("landmark").as("s"), lit(1L).as("sigma"))
      .localCheckpoint(true))
    for (d <- 1 to maxHops) {
      val prev = levels.last
      val atD = dist.filter(col("dist") === d)
        .select(col("node"), col("landmark").as("s"))
      val next = edges
        .join(prev.select(col("node").as("src"), col("s"), col("sigma")),
          "src")
        .select(col("dst").as("node"), col("s"), col("sigma"))
        .join(atD, Seq("node", "s"), "left_semi")
        .groupBy("node", "s").agg(sum("sigma").as("sigma"))
        .localCheckpoint(true)
      levels = levels :+ next
    }
    // backward: δ per level from the deepest in; a node's successors
    // sit exactly one level deeper, so each round joins two adjacent
    // level frames (missing δ on the deepest level reads as 0)
    val zero = levels.last
      .select(col("node"), col("s"), lit(0.0).as("delta"))
      .limit(0)
    var deltaDeeper = zero
    var deltas = Vector.empty[DataFrame]
    for (d <- (maxHops - 1) to 0 by -1) {
      val vs = levels(d)
      val ws = levels(d + 1)
      val term = edges
        .join(vs.select(col("node").as("src"), col("s"),
          col("sigma").as("__sv")), "src")
        .join(ws.select(col("node").as("dst"), col("s"),
          col("sigma").as("__sw")), Seq("dst", "s"))
        .join(deltaDeeper.select(col("node").as("dst"), col("s"),
          col("delta").as("__dw")), Seq("dst", "s"), "left")
        .select(col("src").as("node"), col("s"), col("dst").as("w"),
          ((col("__sv").cast("double") / col("__sw").cast("double")) *
            (lit(1.0) + coalesce(col("__dw"), lit(0.0)))).as("t"))
      val dLevel = term.groupBy("node", "s")
        .agg(neighborSum(col("w"), col("t"), exactFolds).as("delta"))
        .localCheckpoint(true)
      deltas = deltas :+ dLevel
      deltaDeeper = dLevel
    }
    // dist and the σ level frames are fully consumed into the EAGER
    // δ checkpoints above — release their blocks before returning (the
    // returned plan references only edges + the δ frames)
    Exec.releaseCheckpoint(dist)
    levels.foreach(Exec.releaseCheckpoint(_))
    val allDeltas = deltas.reduceLeft(_.unionByName(_))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val bc = allDeltas.filter(col("node") =!= col("s"))
      .groupBy("node")
      .agg(neighborSum(col("s"), col("delta"), exactFolds).as("bc"))
    nodes.join(bc, Seq("node"), "left")
      .select(col("node"), coalesce(col("bc"), lit(0.0)).as("bc"))
    } // withShuffleParts
  }

  /** k-truss decomposition: the maximal subgraph of the UNDIRECTED
    * graph underlying `edges0` in which every EDGE sits in at least
    * k−2 triangles (the edge-level analog of [[kCore]] — trusses are
    * the denser, community-core refinement: every k-truss is inside
    * the (k−1)-core but not vice versa). Iterative peeling: each round
    * recounts per-edge triangle support over the SURVIVING edge set
    * and drops every edge below k−2, until a round removes nothing.
    * Returns (u, v, support) for the surviving edges with their
    * in-truss support — integer-exact, so the q137 gate replays the
    * peel rounds cell-exactly (16 unrolled MATERIALIZED rounds; the
    * engine observes its own convergence and fails fast if `maxRounds`
    * were ever too small, so a silent divergence cannot slip through).
    *
    * Shape at 100 TB: edges orient ONCE by INITIAL (degree, id) — any
    * fixed total order stays acyclic as edges drop, triangle
    * membership is orientation-independent, and initial degrees only
    * shrink, so the [[triangleCounts]] O(m^1.5) wedge bound holds for
    * every round while the per-round degree recount + re-orientation
    * joins of the textbook formulation disappear (3 fewer shuffles per
    * round). Each round is then: wedge join, closure join, one
    * map-side-combined per-edge support count (triangle edges explode
    * ALREADY oriented — the order is transitive), and the filter; edge
    * frames checkpoint per round and release their predecessor; the
    * drop count rides the round's checkpoint as a `Dataset.observe`
    * metric. Support deltas instead of re-counts are the known further
    * optimization and are not needed at gate scale. */
  def kTruss(edges0: DataFrame, k: Int, maxRounds: Int = 16,
             srcCol: String = "src", dstCol: String = "dst",
             requireConverged: Boolean = true): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val obs0 = org.apache.spark.sql.Observation()
    var edges = Exec.checkpointCut(und
      .join(deg.select(col("node").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), "v")
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("b"))
      .observe(obs0, count(lit(1)).as("rows")))
    var prevRows = obs0.get("rows").asInstanceOf[Long]
    var changed = prevRows > 0L
    var round = 0
    // each round CARRIES its computed support through the checkpoint:
    // the converged (no-drop) round's support was computed on exactly
    // the surviving edge set, so the epilogue is a projection instead
    // of one more O(m^1.5) triangle enumeration
    while (changed && round < maxRounds) {
      val prevEdges = edges
      val bare = edges.select("a", "b")
      val obs = org.apache.spark.sql.Observation()
      // k >= 3: an edge in no triangle (absent from the support table)
      // has supp 0 < k-2 and drops either way, and every survivor
      // (supp >= k-2 >= 1) IS in the support table — so the per-round
      // edges⋈support join is pure overhead and the filtered support
      // table alone is the next edge set (one fewer shuffle per peel
      // round). k = 2 keeps every edge, so only there do
      // support-0 edges need the join back.
      val counted =
        if (k >= 3) orientedSupport(bare).filter(col("supp") >= k - 2)
        else bare.join(orientedSupport(bare), Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            coalesce(col("supp"), lit(0L)).as("supp"))
          .filter(col("supp") >= k - 2)
      edges = Exec.checkpointCut(counted
        .observe(obs, count(lit(1)).as("rows")))
      Exec.releaseCheckpoint(prevEdges)
      val rows = obs.get("rows").asInstanceOf[Long]
      changed = rows < prevRows && rows > 0L
      prevRows = rows
      round += 1
    }
    require(!requireConverged || !changed,
      s"k-truss peeling did not converge within $maxRounds rounds " +
        "(deep support cascades — raise maxRounds)")
    if (round == 0)
      // empty input: the loop never ran and no supp column exists
      edges.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"), lit(0L).as("support"))
    else
      // carried supp is the fixpoint support when converged; on a
      // requireConverged=false bail-out it is the PRE-final-drop count
      // (an upper bound on the returned superset — documented)
      edges.select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"),
        col("supp").as("support"))
  }

  /** k-truss by support DECREMENTS — the 100 TB-scale twin of
    * [[kTruss]]'s per-round recount, spec-pinned to identical output
    * (GraphAlgosSpec). Triangles are enumerated ONCE (the single
    * O(m^1.5) pass); each peel round then only (1) kills the alive
    * triangles touching a just-removed edge (three equi-joins against
    * the removed set), (2) decrements the surviving edges' support by
    * the killed triangles' exploded edges, and (3) re-splits. Per-round
    * work is proportional to the support actually destroyed — the sum
    * over ALL rounds is ≤ 3·|triangles| — instead of a fresh full
    * triangle enumeration per round.
    *
    * Trade-offs, measured at the q137 gate scale (sf0.1, mod-100
    * graph, 13 peel rounds): wall time is STAGE-bound there, and this
    * face runs more, smaller stages per round — the recount face stays
    * the gate default (same lesson as the SCC sub-round batching
    * knob). At real scale the balance inverts: the recount face pays
    * O(m^1.5) × rounds in shuffled wedge rows, this face pays it once
    * plus deltas, at the cost of materializing the triangle list
    * (≈ one extra |T|-row checkpoint per round, |T| shrinking
    * monotonically). */
  def kTrussDecremental(edges0: DataFrame, k: Int, maxRounds: Int = 16,
      srcCol: String = "src", dstCol: String = "dst",
      requireConverged: Boolean = true): DataFrame = {
    require(k >= 3, "decremental k-truss requires k >= 3 " +
      "(k = 2 keeps every edge - no peeling exists to incrementalize)")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), "v")
      .select(
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(struct(col("__du"), col("u")) < struct(col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("b"))
      .localCheckpoint(true)
    // the one full enumeration: every triangle as its oriented triple
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
    var tris = Exec.checkpointCut(wedges
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select("a", "b", "c"))
    val supp0 = tris.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("c").as("b")),
        struct(col("a"), col("c").as("b")))).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("supp"))
    val withSupp = oriented.join(supp0, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("supp"), lit(0L)).as("supp"))
    val obs0 = org.apache.spark.sql.Observation()
    var survivors = Exec.checkpointCut(withSupp.filter(col("supp") >= k - 2))
    var removed = Exec.checkpointCut(withSupp.filter(col("supp") < k - 2)
      .select("a", "b")
      .observe(obs0, count(lit(1)).as("rows")))
    var nRemoved = obs0.get("rows").asInstanceOf[Long]
    var round = 0
    while (nRemoved > 0L && round < maxRounds) {
      val (prevT, prevS, prevR) = (tris, survivors, removed)
      val marked = tris
        .join(removed.select(col("a"), col("b"), lit(1).as("__r1")),
          Seq("a", "b"), "left")
        .join(removed.select(col("a").as("b"), col("b").as("c"),
          lit(1).as("__r2")), Seq("b", "c"), "left")
        .join(removed.select(col("a"), col("b").as("c"),
          lit(1).as("__r3")), Seq("a", "c"), "left")
      val killed = marked.filter(col("__r1").isNotNull ||
        col("__r2").isNotNull || col("__r3").isNotNull)
      tris = Exec.checkpointCut(marked.filter(col("__r1").isNull &&
          col("__r2").isNull && col("__r3").isNull)
        .select("a", "b", "c"))
      val decr = killed.select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("c").as("b")),
          struct(col("a"), col("c").as("b")))).as("e"))
        .groupBy(col("e.a").as("a"), col("e.b").as("b"))
        .agg(count(lit(1)).as("__dec"))
      val next = survivors.join(decr, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          (col("supp") - coalesce(col("__dec"), lit(0L))).as("supp"))
      val obs = org.apache.spark.sql.Observation()
      survivors = Exec.checkpointCut(next.filter(col("supp") >= k - 2))
      removed = Exec.checkpointCut(next.filter(col("supp") < k - 2)
        .select("a", "b")
        .observe(obs, count(lit(1)).as("rows")))
      Exec.releaseCheckpoint(prevT, prevS, prevR)
      nRemoved = obs.get("rows").asInstanceOf[Long]
      round += 1
    }
    require(!requireConverged || nRemoved == 0L,
      s"k-truss peeling did not converge within $maxRounds rounds " +
        "(deep support cascades - raise maxRounds)")
    Exec.releaseCheckpoint(tris, removed)
    survivors.select(least(col("a"), col("b")).as("u"),
      greatest(col("a"), col("b")).as("v"), col("supp").as("support"))
  }

  /** Per-edge triangle support of an ORIENTED (acyclic total order)
    * edge frame (a, b): wedge join, closure join, and one explode of
    * each triangle's three edges — all three are oriented pairs by
    * transitivity, so the count keys directly on (a, b). */
  private def orientedSupport(oriented: DataFrame): DataFrame = {
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedges.join(oriented.select(col("a"), col("b").as("c")),
      Seq("a", "c"))
    tri.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("c").as("b")),
        struct(col("a"), col("c").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("supp"))
  }

  /** Bipartite projection: collapse a two-mode (left, right) edge list
    * into the one-mode co-occurrence graph on the LEFT nodes — edge
    * (l1, l2) with weight = the number of DISTINCT right nodes both
    * touch (the co-purchase / co-click / co-citation graph builder
    * whose output feeds [[pageRank]] / [[labelPropagation]] /
    * [[linkPrediction]]). Returns (l1, l2, w) with l1 < l2,
    * integer-exact (gate q135).
    *
    * Shape at 100 TB: the projection through a right node r emits
    * C(deg(r), 2) pairs, so a celebrity right node (a product every
    * customer bought) alone is quadratic — and carries no signal,
    * which is why `maxRightDegree` drops right nodes above a degree
    * cap BEFORE the self-join (the linkPrediction guard; the degree
    * census is a partial agg on the join key, no extra exchange) and
    * `minShared` prunes the single-co-occurrence tail at the
    * map-side-combined count. */
  def bipartiteProject(edges0: DataFrame, leftCol: String = "l",
                       rightCol: String = "r", minShared: Int = 1,
                       maxRightDegree: Option[Int] = None): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    val e = edges0.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
    val bounded = maxRightDegree match {
      case Some(cap) =>
        val rdeg = e.groupBy("r").agg(count(lit(1)).as("__d"))
        e.join(rdeg.filter(col("__d") <= cap).select("r"), "r")
      case None => e
    }
    bounded.select(col("r"), col("l").as("l1"))
      .join(bounded.select(col("r"), col("l").as("l2")), "r")
      .filter(col("l1") < col("l2"))
      .groupBy("l1", "l2").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minShared)
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan et
    * al. 2007) over the undirected graph: every node starts as its own
    * label; each round every node adopts the MOST FREQUENT label among
    * its neighbors, ties broken to the SMALLEST label — the
    * deterministic tie rule that makes fixed-round runs replayable in
    * any engine (classic LPA breaks ties randomly; synchronous sweeps
    * can oscillate on bipartite structures, which is why `rounds` is a
    * FIXED count rather than a convergence loop — the standard
    * bounded-sweep deployment). Distinct from
    * [[Dedup.connectedComponents]]: min-label propagation merges every
    * connected node set; frequency voting stops at community
    * boundaries, where a node's in-community degree outvotes its
    * cross-community edges.
    *
    * Shape at 100 TB: the symmetrized adjacency partitions ONCE on the
    * neighbor key (AQE-off capture — per-round label joins re-use the
    * layout with no edge shuffle); each round is one join + one
    * map-side-combined (node, label) count + one per-node max_by; label
    * frames checkpoint per round and release their predecessor. */
  def labelPropagation(edges0: DataFrame, rounds: Int = 4,
                       srcCol: String = "src",
                       dstCol: String = "dst",
                       weightCol: Option[String] = None): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val spark = edges0.sparkSession
    // undirected edge weights: parallel/duplicate (u,v) rows SUM
    // (weight-1 everywhere ≡ the unweighted distinct form — spec-pinned)
    val und = weightCol match {
      case None => edges0
        .select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .withColumn("__w", lit(1L))
      case Some(w) => edges0
        .select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"), col(w).as("__w0"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v").agg(sum(col("__w0")).as("__w"))
    }
    val adj = Dedup.withAqeOff(spark) {
      und.select(col("u").as("node"), col("v").as("nbr"), col("__w"))
        .union(und.select(col("v"), col("u"), col("__w")))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("nbr")))
        .localCheckpoint(true)
    }
    // loop at the adjacency's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, adj.rdd.getNumPartitions) {
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var prevLabels: DataFrame = labels // own checkpoint: releasable
    for (_ <- 1 to rounds) {
      labels = Exec.checkpointCut(
        adj.join(labels.select(col("node").as("nbr"), col("label")),
          "nbr")
        .groupBy("node", "label").agg(sum(col("__w")).as("__c"))
        .groupBy("node")
        .agg(max_by(col("label"), struct(col("__c"), negate(col("label"))))
          .as("label")))
      Exec.releaseCheckpoint(prevLabels)
      prevLabels = labels
    }
    labels
    } // withShuffleParts
  }

  /** Strongly connected components by forward-backward coloring — the
    * directed twin of [[Dedup.connectedComponents]] and the standard
    * distributed SCC (the same outer structure Spark GraphX ships):
    * repeat { trim trivial nodes; color = min id forward-reachable
    * (min-label propagation to fixpoint); every color root (c(v) = v)
    * is the minimum of its SCC; mark the root's SCC by BACKWARD
    * propagation restricted to same-color edges; assign + remove }.
    *
    * Correctness of one outer round: c(v) = min id that reaches v, so
    * a root r reaches every v with c(v) = r and is reached by none
    * smaller — members of r's SCC all carry color r (they reach r, so
    * anything reaching them reaches r and c ≥ r; r reaches them, so
    * c ≤ r), and a same-color backward sweep from r marks exactly the
    * nodes reaching r THROUGH r-colored nodes — SCC paths qualify
    * (every intermediate is in the SCC, and mutual-reach paths never
    * leave the SCC: a foreign waypoint would itself be mutually
    * reachable and thus inside), and any marked v both reaches r (the
    * sweep) and is reached by r (its color), so marked ≡ SCC(r). The
    * global minimum active id is always a root, so every outer round
    * retires ≥ 1 component; rounds scale with the condensation's
    * root-chain depth, not |V|.
    *
    * Returns (node, scc) with scc = the minimum member id, for every
    * node incident to a non-self-loop edge (self-loops drop and
    * isolated ids do not reach the output — the
    * [[Dedup.connectedComponents]] convention).
    *
    * Shape at 100 TB: the active edge table re-checkpoints partitioned
    * on src once per OUTER round and the inner color loop reuses it
    * round after round (frontier joins move only |V|-sized label rows;
    * the label update aggregates with map-side combine); trim and
    * removal are semi/anti joins against |V|-sized sets. Convergence
    * counts ride each checkpoint's own action as `Dataset.observe`
    * metrics — no second pass — and each round frees the previous
    * round's checkpoint blocks. (A sub-round batching knob was
    * measured and rejected: wall time is STAGE-bound — one shuffle
    * stage per propagation round regardless of how rounds group into
    * jobs — so batching only added plan/caching overhead.) */
  def stronglyConnectedComponents(edges0: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      maxOuter: Int = 16, maxInner: Int = 64,
      requireConverged: Boolean = true): DataFrame = {
    require(maxOuter >= 1, "maxOuter must be >= 1")
    require(maxInner >= 1, "maxInner must be >= 1")
    val spark = edges0.sparkSession
    var edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("u"), col(dstCol).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("u")))
        .localCheckpoint(true)
    }
    val idType = edges.schema("u").dataType
    // the whole iterative body runs at the static frame's size-derived
    // partition count, so every per-round frame co-partitions with the
    // edge table (see Exec.withShuffleParts: a count mismatch re-shuffles
    // the |E| side every inner round)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    val obsN0 = org.apache.spark.sql.Observation()
    var nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v")))
      .distinct()
      .observe(obsN0, count(lit(1)).as("n"))
      .localCheckpoint(true)
    var nActive = obsN0.get("n").asInstanceOf[Long]
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nActive > 0L && outer < maxOuter) {
      // --- trim to fixpoint: a node with no active in-edge or no
      // active out-edge lies on no cycle — it is its own SCC. Each
      // pass removes ALL current sources and sinks, so a DAG region of
      // depth d drains in O(d) cheap passes instead of d outer rounds.
      var trimming = true
      while (trimming && nActive > 0L) {
        val both = edges.select(col("u").as("id")).distinct()
          .join(edges.select(col("v").as("id")).distinct(),
            Seq("id"), "left_semi")
        val obsT = org.apache.spark.sql.Observation()
        val trivial = Exec.checkpointCut(
          nodes.join(both, Seq("id"), "left_anti")
            .select(col("id").as("node"), col("id").as("scc"))
            .observe(obsT, count(lit(1)).as("n")))
        val nTrivial = obsT.get("n").asInstanceOf[Long]
        if (nTrivial == 0L) {
          Exec.releaseCheckpoint(trivial)
          trimming = false
        } else {
          parts += trivial
          val prevNodes = nodes
          val prevEdges = edges
          nodes = Exec.checkpointCut(
            nodes.join(trivial.select(col("node").as("id")),
              Seq("id"), "left_anti"))
          edges = Dedup.withAqeOff(spark) {
            Exec.checkpointCut(edges
              .join(nodes.select(col("id").as("u")), Seq("u"), "left_semi")
              .join(nodes.select(col("id").as("v")), Seq("v"), "left_semi")
              .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("u"))))
          }
          Exec.releaseCheckpoint(prevNodes, prevEdges)
          nActive -= nTrivial
        }
      }
      if (nActive > 0L) {
        // --- color: c = min id forward-reachable to v, to fixpoint
        var colors = Exec.checkpointCut(
          nodes.select(col("id"), col("id").as("c")))
        var inner = 0
        var changed = true
        // `stride` propagation sub-rounds share one checkpoint action;
        // convergence observes only the FINAL sub-round — min-label
        // descent is monotone, so "last full round improved nothing"
        // IS the fixpoint witness, and at most stride−1 post-fixpoint
        // sub-rounds of join work are wasted (the action-count trade:
        // iterative tiny rounds are scheduler-bound, not shuffle-bound)
        while (changed && inner < maxInner) {
          val step = edges.join(colors, col("u") === col("id"))
            .select(col("v").as("id"), col("c"))
            .withColumn("old", lit(null).cast(idType))
          val obs = org.apache.spark.sql.Observation()
          val updated = colors.withColumn("old", col("c"))
            .unionByName(step)
            .groupBy("id")
            // every id has exactly one self row, so min(old) (nulls
            // ignored) recovers its previous color next to the new min
            .agg(min(col("c")).as("c"), min(col("old")).as("old"))
            .observe(obs, count(when(col("c") < col("old"), 1))
              .as("improved"))
            .select("id", "c")
            .pipe(Exec.checkpointCut)
          Exec.releaseCheckpoint(colors)
          colors = updated
          changed = obs.get("improved").asInstanceOf[Long] > 0L
          inner += 1
        }
        require(!requireConverged || !changed,
          s"SCC color propagation did not converge within $maxInner " +
            "inner rounds (long reachability chains — raise maxInner)")
        // --- backward sweep within same color, from the roots
        val ce = edges
          .join(colors.select(col("id").as("u"), col("c").as("cu")), "u")
          .join(colors.select(col("id").as("v"), col("c").as("cv")), "v")
          .filter(col("cu") === col("cv"))
          .select(col("u"), col("v"), col("cu").as("c"))
          .pipe(Exec.checkpointCut)
        var marked = Exec.checkpointCut(
          colors.filter(col("c") === col("id")))
        var growing = true
        var back = 0
        while (growing && back < maxInner) {
          val grow = ce.join(marked,
              ce("v") === marked("id") && ce("c") === marked("c"))
            .select(ce("u").as("id"), ce("c").as("c"))
            .distinct()
            .withColumn("m", lit(null).cast("int"))
          val obs = org.apache.spark.sql.Observation()
          val updated = marked.withColumn("m", lit(1))
            .unionByName(grow)
            .groupBy("id")
            .agg(min(col("c")).as("c"), max(col("m")).as("m"))
            .observe(obs, count(when(col("m").isNull, 1)).as("grown"))
            .select("id", "c")
            .pipe(Exec.checkpointCut)
          Exec.releaseCheckpoint(marked)
          marked = updated
          growing = obs.get("grown").asInstanceOf[Long] > 0L
          back += 1
        }
        require(!requireConverged || !growing,
          s"SCC backward sweep did not converge within $maxInner inner " +
            "rounds (long in-SCC paths — raise maxInner)")
        parts += marked.select(col("id").as("node"), col("c").as("scc"))
          .localCheckpoint(true)
        val obsN = org.apache.spark.sql.Observation()
        val prevNodes = nodes
        val prevEdges = edges
        nodes = Exec.checkpointCut(
          nodes.join(marked.select("id"), Seq("id"), "left_anti")
            .observe(obsN, count(lit(1)).as("n")))
        edges = Dedup.withAqeOff(spark) {
          Exec.checkpointCut(edges
            .join(nodes.select(col("id").as("u")), Seq("u"), "left_semi")
            .join(nodes.select(col("id").as("v")), Seq("v"), "left_semi")
            .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("u"))))
        }
        Exec.releaseCheckpoint(prevNodes, prevEdges, colors, ce, marked)
        nActive = obsN.get("n").asInstanceOf[Long]
      }
      outer += 1
    }
    require(!requireConverged || nActive == 0L,
      s"SCC did not converge within $maxOuter outer rounds (deep " +
        "condensation root chains — raise maxOuter)")
    Exec.releaseCheckpoint(nodes, edges)
    if (parts.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", idType),
          org.apache.spark.sql.types.StructField("scc", idType))))
    else {
      val out = parts.reduce(_ unionByName _).localCheckpoint(true)
      Exec.releaseCheckpoint(parts.toSeq: _*)
      out
    }
    } // withShuffleParts
  }

  /** Graph-level reciprocity census: of the distinct directed non-loop
    * edges, how many have their reverse present. Returns ONE row
    * (n_edges, n_recip, reciprocity = n_recip/n_edges as one IEEE
    * division of exact BIGINT counts — bit-replayable in any engine).
    * The reciprocity ratio is the standard first diagnostic of a
    * directed graph's symmetry (citation vs follower vs conversation
    * shapes).
    *
    * Shape at 100 TB: one distinct, one self-equi-join on the reversed
    * key pair (shuffle on (src, dst) both sides — no broadcast, the
    * mirror side is the same table), one map-side-combined global
    * count. */
  /** Rich-club census: for each degree threshold k, the node count
    * n_k with degree > k, the edge count e_k with BOTH endpoints above
    * k, and φ(k) = 2·e_k / (n_k·(n_k−1)) — the standard test of
    * whether hubs preferentially interconnect. Exact integer counts
    * folded in ONE conditional aggregation over the degree-joined edge
    * table (no per-k scan); φ is one final IEEE division, null when
    * n_k < 2. */
  def richClub(edges0: DataFrame, ks: Seq[Int], srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(ks.nonEmpty, "need at least one threshold")
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val nAggs = ks.map(k => count(when(col("d") > k, 1)).as(s"__n_$k"))
    val nK = deg.agg(nAggs.head, nAggs.tail: _*)
    val eAggs = ks.map(k =>
      count(when(col("__du") > k && col("__dv") > k, 1)).as(s"__e_$k"))
    val eK = und
      .join(deg.select(col("node").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__dv")), "v")
      .agg(eAggs.head, eAggs.tail: _*)
    val wide = nK.crossJoin(eK)
    val rows = ks.map { k =>
      struct(lit(k.toLong).as("k"), col(s"__n_$k").as("n_k"),
        col(s"__e_$k").as("e_k"),
        when(col(s"__n_$k") >= 2,
          (lit(2) * col(s"__e_$k")).cast("double") /
            (col(s"__n_$k") * (col(s"__n_$k") - 1)).cast("double"))
          .as("phi"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  def reciprocity(edges0: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst"): DataFrame = {
    val e = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"),
      lit(1).as("__r"))
    e.join(rev, Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("n_edges"), count(col("__r")).as("n_recip"))
      .select(col("n_edges"), col("n_recip"),
        (col("n_recip").cast("double") / col("n_edges").cast("double"))
          .as("reciprocity"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over the edges of the UNDIRECTED graph under
    * `edges0` (each edge sampled in both orientations — the symmetric
    * convention, so Σx = Σy). Positive = hubs attach to hubs
    * (social-network shape), negative = hubs attach to leaves
    * (internet/biology shape).
    *
    * Every moment is an exact BIGINT sum (degree products stay far
    * under 2^63 until |E|·deg² ~ 10^18) and the coefficient is ONE
    * fixed IEEE expression over those exact integers — casts are exact
    * below 2^53 — so the q141 gate hash-replays bit-identically in
    * DuckDB. Returns ONE row (n_samples, s_xy, assortativity).
    *
    * Shape at 100 TB: degree census = one map-side-combined count on
    * the edge table; the two degree joins shuffle edge rows on u then
    * v; the moments collapse in a single map-side-combined global
    * aggregate. No driver-side iteration. */
  def degreeAssortativity(edges0: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst"): DataFrame = {
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val both = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val sums = both
      .join(deg.select(col("node").as("u"), col("d").as("dx")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dy")), "v")
      .agg(count(lit(1)).as("m"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    sums.select(col("m").as("n_samples"), col("sxy").as("s_xy"),
      ((col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
          .cast("double")) *
          sqrt((col("m") * col("syy") - col("sy") * col("sy"))
            .cast("double"))))
        .as("assortativity"))
  }

  /** Newman modularity of a node partition over the UNDIRECTED graph
    * under `edges0`: Q = Σ_c [e_c/m − (d_c/2m)²] where e_c = intra-c
    * edges, d_c = degree mass of c, m = edges — the standard quality
    * score for [[labelPropagation]] / clustering output. Computed as
    * the EXACT integer numerator q_num = 4m·Σe_c − Σd_c² over
    * denominator 4m², with ONE final IEEE division (both sides < 2^53
    * until m ~ 5·10⁷ per evaluation scope), so the q147 gate replays
    * bit-identically. Nodes missing from `labels` drop with their
    * edges (inner-join convention — score the labeled subgraph).
    * Returns ONE row (m, q_num, modularity).
    *
    * Shape at 100 TB: two label joins shuffle the edge table (on u
    * then v), then everything collapses through map-side-combined
    * counts; the final row is a cross join of three scalar aggregates.
    * No driver-side iteration. */
  def modularity(edges0: DataFrame, labels: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      nodeCol: String = "node", labelCol: String = "label"): DataFrame = {
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val lab = labels.select(col(nodeCol), col(labelCol)).distinct()
    val j = und
      .join(lab.select(col(nodeCol).as("u"), col(labelCol).as("lu")), "u")
      .join(lab.select(col(nodeCol).as("v"), col(labelCol).as("lv")), "v")
    Exec.withPersisted(j) {
      val mDf = j.agg(count(lit(1)).as("m"))
      val dc = j.select(explode(array(col("lu"), col("lv"))).as("lbl"))
        .groupBy("lbl").agg(count(lit(1)).as("d"))
      val sd2 = dc.agg(sum(col("d") * col("d")).as("sd2"))
      val se = j.filter(col("lu") === col("lv"))
        .agg(count(lit(1)).as("se"))
      mDf.crossJoin(broadcast(sd2)).crossJoin(broadcast(se))
        .select(col("m"),
          (lit(4L) * col("m") * col("se") - col("sd2")).as("q_num"),
          ((lit(4L) * col("m") * col("se") - col("sd2")).cast("double") /
            (lit(4L) * col("m") * col("m")).cast("double"))
            .as("modularity"))
    }
  }

  /** Deterministic hash-greedy random walks — the graph-sampling
    * primitive under DeepWalk/node2vec-style embedding training: one
    * walk per start node, `steps` hops, each hop moving to the
    * out-neighbor that minimizes a keyed hash of
    * (seed, walk, step, src, dst). The hash is the only randomness, so
    * walks replay bit-identically across runs AND engines; per-step
    * re-keying lets revisits leave differently (no 2-cycle traps).
    * `md5Hash = true` ranks by the md5 hex string — the
    * [[Dedup.md5HashFamily]] convention, replayable in the DuckDB
    * oracle (gate q143); the default ranks by xxhash64 — same
    * machinery, codegen'd and far cheaper, for production sampling.
    *
    * Dead ends terminate the walk (its rows stop at the last reachable
    * step). Returns (walk, step, node), step 0 = the start.
    *
    * Shape at 100 TB: the frontier is |walks| rows; each step is one
    * frontier⋈edges join (shuffle moves frontier rows to the edge
    * partitioning) and one map-side-combined min_by per walk —
    * candidate fan-out is bounded by out-degree, never materialized
    * past the partial aggregate. Each step's frontier checkpoints
    * eagerly (the assembled output replays no step twice); all step
    * checkpoints release only after the output materializes. */
  def hashGreedyWalks(edges0: DataFrame, starts: DataFrame, steps: Int,
      srcCol: String = "src", dstCol: String = "dst",
      startCol: String = "node", seed: String = "walk",
      md5Hash: Boolean = false): DataFrame = {
    require(steps >= 0, "steps must be >= 0")
    val e = edges0.select(col(srcCol).as("s"), col(dstCol).as("t"))
      .filter(col("s") =!= col("t")).distinct()
      .localCheckpoint(true)
    var frontier = starts.select(col(startCol).as("walk")).distinct()
      .select(col("walk"), col("walk").as("node"))
      .localCheckpoint(true)
    val fronts = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    val outs = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.select(col("walk"), lit(0).as("step"), col("node")))
    for (i <- 0 until steps) {
      val rank =
        if (md5Hash)
          md5(concat_ws("|", lit(seed), col("walk").cast("string"),
            lit(i.toString), col("s").cast("string"),
            col("t").cast("string")))
        else
          xxhash64(lit(seed), col("walk"), lit(i), col("s"), col("t"))
      frontier = frontier.join(e, frontier("node") === e("s"))
        .select(col("walk"), col("s"), col("t"), rank.as("__h"))
        .groupBy("walk")
        .agg(min_by(col("t"), col("__h")).as("node"))
        .localCheckpoint(true)
      fronts += frontier
      outs += frontier.select(col("walk"), lit(i + 1).as("step"),
        col("node"))
    }
    val out = outs.reduce(_ unionByName _).localCheckpoint(true)
    Exec.releaseCheckpoint(fronts.toSeq :+ e: _*)
    out
  }

  /** Degree distribution with exact log₂ binning: undirected degrees
    * histogrammed into [2ᵇ, 2ᵇ⁺¹) buckets — the power-law census every
    * graph profile opens with. The bin index is the binary-string
    * length minus one (`conv(d, 10, 2)` — integer arithmetic, NO
    * floating log2 to diverge between engines). Two map-side-combined
    * folds; output is ≤ 64 rows. */
  def degreeDistribution(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    und.select(col("u").as("node"))
      .union(und.select(col("v")))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .select((length(conv(col("d"), 10, 2)) - 1).cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_nodes"))
      .withColumn("degree_lo", expr("shiftleft(CAST(1 AS BIGINT), bin)"))
  }

  /** Minimum spanning forest by distributed Borůvka: each round every
    * component selects its minimum incident cross edge under the TOTAL
    * order (w, u, v) — the tie-break makes weights effectively
    * distinct, so the selected set can never close a cycle — and the
    * components merge; ≥ halving per round bounds the loop at
    * ⌈log₂ V⌉ rounds. Integer-exact end to end; parallel edges
    * collapse to their minimum weight up front.
    *
    * The merge step never recomputes components from scratch: each
    * component points along its selected edge (a functional graph
    * whose only cycles are mutual-min pairs, broken toward the smaller
    * label), and POINTER JUMPING (p ← p∘p, ⌈log₂ depth⌉ self-joins of
    * the component-sized table, convergence riding `observe` on the
    * jump's checkpoint) resolves every chain to its root; node labels
    * then compose through the round's (comp → root) mapping — one
    * |V|-row join, the forest itself is never re-walked.
    *
    * Shape at 100 TB: the canonical edge table partitions once
    * (AQE-off capture) and never re-shuffles; per round, two label
    * hash-joins (|V| build side), one map-side-combined min-struct
    * aggregate over cross edges, then jump rounds over a table that
    * HALVES every Borůvka round. Dead checkpoints are released per
    * round. */
  def minSpanningForest(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", weightCol: String = "w",
      maxRounds: Int = 16, requireConverged: Boolean = true): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"),
          col(weightCol).cast("long").as("w"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v").agg(min("w").as("w"))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("u")))
        .localCheckpoint(true)
    }
    var forest: DataFrame = null   // accumulated (u, v, w) — ≤ V−1 rows
    var labels: DataFrame = null   // (id, component), null = identity
    var done = false
    var round = 0
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    while (!done && round < maxRounds) {
      val withComps = if (labels == null)
        edges.select(col("u"), col("v"), col("w"),
          col("u").as("cu"), col("v").as("cv"))
      else edges
        .join(labels.select(col("id").as("u"), col("component").as("cu")),
          Seq("u"), "left")
        .join(labels.select(col("id").as("v"), col("component").as("cv")),
          Seq("v"), "left")
        .select(col("u"), col("v"), col("w"),
          coalesce(col("cu"), col("u")).as("cu"),
          coalesce(col("cv"), col("v")).as("cv"))
      val cross = withComps.filter(col("cu") =!= col("cv"))
      val cand = cross.select(col("cu").as("comp"),
          struct(col("w"), col("u"), col("v"), col("cu"), col("cv"))
            .as("e"))
        .union(cross.select(col("cv").as("comp"),
          struct(col("w"), col("u"), col("v"), col("cu"), col("cv"))
            .as("e")))
      val obs = org.apache.spark.sql.Observation()
      // per-component minimum cross edge, with the partner component
      val sel = Exec.checkpointCut(cand.groupBy("comp").agg(min("e").as("e"))
        .select(col("comp"), col("e.u").as("u"), col("e.v").as("v"),
          col("e.w").as("w"),
          when(col("comp") === col("e.cu"), col("e.cv"))
            .otherwise(col("e.cu")).as("partner"))
        .observe(obs, count(lit(1)).as("rows")))
      val picked = obs.get("rows").asInstanceOf[Long]
      if (picked == 0L) {
        Exec.releaseCheckpoint(sel)
        done = true
      } else {
        // pointer graph: p(c) = partner(c); mutual-min 2-cycles (the
        // only cycles under the edge total order) break to the smaller.
        // Each jump JOB composes three lookups in one plan and
        // SELF-CERTIFIES: pointers move monotonically toward their
        // root, so "the 3rd lookup moved nothing beyond the 2nd" is a
        // fixpoint proof observed on the same materialization — no
        // separate confirmation job. One job resolves depth ≤ 8; k
        // jobs, depth ≤ 8·4^(k−1). The first job folds the
        // mutual-break construction in — sel is the checkpoint it
        // re-reads, never an unmaterialized plan.
        var p: DataFrame = null
        var jumping = true
        while (jumping) {
          val base = if (p != null) p else sel.alias("a")
            .join(sel.select(col("comp").as("partner"),
              col("partner").as("pp")).alias("b"), Seq("partner"), "left")
            .select(col("comp"),
              when(col("pp") === col("comp") &&
                col("comp") < col("partner"),
                col("comp")).otherwise(col("partner")).as("p"))
          def m(k: String, v: String) =
            base.select(col("comp").as(k), col("p").as(v))
          val jObs = org.apache.spark.sql.Observation()
          val prevP = p
          p = Exec.checkpointCut(base
            .join(m("__k1", "__v1"), col("p") === col("__k1"), "left")
            .select(col("comp"),
              coalesce(col("__v1"), col("p")).as("__q1"))
            .join(m("__k2", "__v2"), col("__q1") === col("__k2"), "left")
            .select(col("comp"), col("__q1"),
              coalesce(col("__v2"), col("__q1")).as("__q2"))
            .join(m("__k3", "__v3"), col("__q2") === col("__k3"), "left")
            .select(col("comp"), col("__q2"),
              coalesce(col("__v3"), col("__q2")).as("p"))
            .withColumn("__settled", col("p") === col("__q2"))
            .observe(jObs, sum(when(col("__settled"), 0L).otherwise(1L))
              .as("moved"))
            .select("comp", "p"))
          if (prevP != null) Exec.releaseCheckpoint(prevP)
          jumping = Option(jObs.get("moved")).exists(_.asInstanceOf[Long] > 0L)
        }
        // compose node labels through this round's (comp → root) map —
        // ONE |V|-row join per round, checkpointed so the next round's
        // selection reads a materialized label table (a lazy compose
        // chain was measured SLOWER at gate scale: plan compile cost
        // outweighs the saved job)
        val prevLabels = labels
        labels = Exec.checkpointCut {
          val base = if (prevLabels == null)
            edges.select(col("u").as("id")).union(edges.select(col("v")))
              .distinct().select(col("id"), col("id").as("component"))
          else prevLabels
          base.join(p.select(col("comp").as("component"), col("p")),
              Seq("component"), "left")
            .select(col("id"),
              coalesce(col("p"), col("component")).as("component"))
        }
        if (prevLabels != null) Exec.releaseCheckpoint(prevLabels)
        Exec.releaseCheckpoint(p)
        // sel's checkpoint stays alive: the final forest union reads
        // it (≤ #components rows per round, log-many rounds — tiny)
        val newEdges = sel.select("u", "v", "w").distinct()
        forest = if (forest == null) newEdges else forest.union(newEdges)
        round += 1
      }
    }
    require(!requireConverged || done,
      s"Boruvka did not converge within $maxRounds rounds")
    if (forest == null) edges.limit(0)
    else forest.groupBy("u", "v").agg(min("w").as("w"))
    } // withShuffleParts
  }

  /** Densest subgraph, distributed greedy peel (Bahmani–Kumar–
    * Vattani 2012, 2(1+ε)-approx): each round measures the current
    * average-degree density and removes EVERY node whose degree is
    * ≤ (1+ε)·avg — the threshold comparison cross-multiplied to exact
    * integers (deg·V·εden ≤ (εden+εnum)·A with A = Σdeg = 2E), so the
    * peel is engine-independent — then keeps the best-density round
    * under the exact rational order A_i·V_best > A_best·V_i (strict:
    * earliest best wins ties). Min degree ≤ average guarantees every
    * round removes something, so the loop is ≤ log_{1+ε} V rounds.
    *
    * Returns the best round's members as (node, deg — degree INSIDE
    * that subgraph) plus the constant witness columns
    * (best_round, best_v, best_e, density).
    *
    * Shape at 100 TB: the [[kCore]] loop contract — node-partitioned
    * adjacency captured once, per-round map-side-combined degree
    * census, two anti-joins against the (fringe-sized) removal set,
    * dead checkpoints freed per round. The per-round stats row is a
    * 1-row collect (the centroid contract). */
  def densestSubgraph(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", epsNum: Int = 1, epsDen: Int = 1,
      maxRounds: Int = 32, requireConverged: Boolean = true): DataFrame = {
    require(epsNum >= 0 && epsDen >= 1, "epsilon must be >= 0")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    val und = edges0
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    var adj = Dedup.withAqeOff(spark) {
      und.select(col("u").as("node"), col("v").as("nbr"))
        .union(und.select(col("v"), col("u")))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("node")))
        .localCheckpoint(true)
    }
    var bestDeg: DataFrame = null
    var bestA = 0L; var bestV = 0L; var bestRound = -1
    var round = 0
    var empty = false
    // loop at the adjacency's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, adj.rdd.getNumPartitions) {
    while (!empty && round < maxRounds) {
      val deg = Exec.checkpointCut(
        adj.groupBy("node").agg(count(lit(1)).as("deg")))
      // 1-row stats collect per round — the centroid contract
      val stats = deg.agg(coalesce(sum(col("deg")), lit(0L)).as("a"),
        count(lit(1)).as("v")).collect()(0)
      val a = stats.getLong(0); val v = stats.getLong(1)
      if (v == 0L) {
        Exec.releaseCheckpoint(deg)
        empty = true
      } else {
        // strict exact-rational improvement; earliest best wins ties
        if (bestRound < 0 || a * bestV > bestA * v) {
          if (bestDeg != null) Exec.releaseCheckpoint(bestDeg)
          bestDeg = deg; bestA = a; bestV = v; bestRound = round
        }
        val removed = Exec.checkpointCut(deg
          .filter(col("deg") * v * epsDen <= lit((epsDen + epsNum).toLong) * a)
          .select("node"))
        val prevAdj = adj
        adj = Exec.checkpointCut(adj
          .join(removed, Seq("node"), "left_anti")
          .join(removed.select(col("node").as("nbr")), Seq("nbr"), "left_anti")
          .select("node", "nbr"))
        Exec.releaseCheckpoint(prevAdj, removed)
        if (deg ne bestDeg) Exec.releaseCheckpoint(deg)
        round += 1
      }
    }
    } // withShuffleParts
    require(!requireConverged || empty,
      s"densest-subgraph peel did not exhaust the graph within " +
        s"$maxRounds rounds")
    if (bestDeg == null)
      adj.groupBy("node").agg(count(lit(1)).as("deg"))
        .withColumn("best_round", lit(-1))
        .withColumn("best_v", lit(0L)).withColumn("best_e", lit(0L))
        .withColumn("density", lit(0.0d))
    else bestDeg
      .withColumn("best_round", lit(bestRound))
      .withColumn("best_v", lit(bestV))
      .withColumn("best_e", lit(bestA / 2))
      // ONE fixed IEEE division over the exact witness pair
      .withColumn("density",
        lit(bestA / 2).cast("double") / lit(bestV).cast("double"))
  }

  /** Stationary distribution of the Markov chain defined by a weighted
    * transition edge list: x₀ uniform over states, then a fixed number
    * of power-iteration rounds x'(v) = Σ_u x(u)·(w_{uv}/W_u), with
    * DANGLING states (no out-edges) holding their mass in place (the
    * self-loop convention — mass is conserved exactly, unlike the
    * absorb-and-lose alternative). A fixed iteration count with
    * `exactFolds` (source-sorted neighbor folds, the [[pageRank]]
    * contract) replays bit-identically in any engine.
    *
    * Shape at 100 TB: identical to [[weightedPageRank]] — the edge
    * table partitions on src once, each round shuffles only the
    * |states| distribution table plus a map-side-combined contribution
    * aggregate. */
  def markovStationary(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", weightCol: String = "w",
      iterations: Int = 6, exactFolds: Boolean = false): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"),
          col(weightCol).cast("long").as("__w"))
        .groupBy("src", "dst").agg(sum("__w").as("__w"))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    val wsum = edges.groupBy("src").agg(sum(col("__w")).as("wsum"))
    val srcs = edges.select(col("src").as("node")).distinct()
    val nodes = Exec.checkpointCut(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct()
        .join(srcs.withColumn("__out", lit(true)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__out"), lit(false)).as("__out")))
    val n = nodes.count()
    var x = nodes.select(col("node"),
      (lit(1.0d) / lit(n).cast("double")).as("p"))
    var prevX: DataFrame = null
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(wsum, "src")
        .join(x, col("src") === col("node"))
        .select(col("dst"), col("src"),
          (col("p") * (col("__w").cast("double") /
            col("wsum").cast("double"))).as("c"))
      val sums = contribs.groupBy(col("dst").as("node"))
        .agg(neighborSum(col("src"), col("c"), exactFolds).as("s"))
      x = Exec.checkpointCut(nodes
        .join(sums, Seq("node"), "left")
        .join(x.select(col("node"), col("p").as("__pp")), Seq("node"))
        .select(col("node"),
          (coalesce(col("s"), lit(0.0d)) +
            when(!col("__out"), col("__pp")).otherwise(lit(0.0d))).as("p")))
      if (prevX != null) Exec.releaseCheckpoint(prevX)
      prevX = x
    }
    x
    } // withShuffleParts
  }

  /** Katz centrality with a dyadic attenuation α = 2^−`alphaInvLog2`
    * and unit base: x_t = α·Aᵀ·x_{t−1} + 1 for a FIXED `iterations`,
    * x_0 = 0. The whole recursion is carried as the INTEGER numerator
    * N_t = x_t·2^(a·t) (N_t(v) = Σ_{u→v} N_{t−1}(u) + 2^(a·t)) in
    * DECIMAL(38,0) — associative, so any partial-agg plan is exact —
    * and the final score is ONE division N_T / 2^(a·T). Growth bound:
    * N_T ≲ (maxindeg)^T·2^(a·T); keep T small or α deep for
    * degree-huge graphs (DECIMAL38 overflows loudly, not silently).
    *
    * Shape at 100 TB: the [[pageRank]] loop contract — the distinct'd
    * edge table partitions on src once; each round shuffles only the
    * |V| numerator table for the src join plus one map-side-combined
    * dst aggregation. */
  def katzCentrality(edges0: DataFrame, iterations: Int = 4,
      alphaInvLog2: Int = 3, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(alphaInvLog2 >= 1 && alphaInvLog2 <= 20, "alpha = 2^-a, a in [1,20]")
    val d38 = DecimalType(38, 0)
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .distinct()
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    val nodes = Exec.checkpointCut(
      edges.select(col("src").as("node"))
        .union(edges.select(col("dst"))).distinct())
    var num = nodes.select(col("node"), lit(0).cast(d38).as("__n"))
    var prevNum: DataFrame = null
    for (t <- 1 to iterations) {
      val beta = math.pow(2.0, (alphaInvLog2 * t).toDouble).toLong
      val sums = edges
        .join(num, col("src") === col("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__n")).as("__s"))
      num = Exec.checkpointCut(nodes
        .join(sums, Seq("node"), "left")
        .select(col("node"),
          (coalesce(col("__s"), lit(0).cast(d38)) + beta).as("__n")))
      if (prevNum != null) Exec.releaseCheckpoint(prevNum)
      prevNum = num
    }
    val scale = math.pow(2.0, (alphaInvLog2 * iterations).toDouble)
    num.select(col("node"),
      col("__n").cast("long").as("katz_num"),
      (col("__n").cast("double") / lit(scale)).as("katz"))
    } // withShuffleParts
  }

  /** Full reachability BFS: every node reachable from `seeds` along
    * `edges` (seeds included), frontier-based with per-round
    * checkpoint release and observed convergence. */
  private def reachableFrom(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int): DataFrame = {
    var visited = Exec.checkpointCut(seeds.distinct())
    var frontier = visited
    var done = false
    var round = 0
    while (!done && round < maxRounds) {
      val obs = org.apache.spark.sql.Observation()
      val next = Exec.checkpointCut(edges
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .observe(obs, count(lit(1)).as("rows")))
      if (obs.get("rows").asInstanceOf[Long] == 0L) {
        Exec.releaseCheckpoint(next)
        done = true
      } else {
        val prev = visited
        visited = Exec.checkpointCut(visited.unionByName(next))
        Exec.releaseCheckpoint(prev, frontier)
        frontier = next
        round += 1
      }
    }
    require(done, s"reachability did not converge within $maxRounds rounds")
    visited
  }

  /** Bowtie decomposition (Broder et al., WWW 2000, simplified to four
    * classes): relative to the LARGEST strongly connected component
    * (ties broken by smallest component id), every node is `scc`
    * (member), `in` (reaches the SCC), `out` (reached from it), or
    * `other` (tendrils/tubes/disconnected — not separated further).
    * Classification priority scc > in > out mirrors the oracle's CASE
    * order exactly. Emits (bowtie_class, n_nodes).
    *
    * Shape at 100 TB: one [[stronglyConnectedComponents]] run, then
    * everything else happens on the CONDENSATION DAG — component-level
    * edges (two label joins + distinct), two frontier sweeps whose
    * round count is the DAG depth and whose frames are
    * component-sized, and one label join back to nodes. */
  def bowtie(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxRounds: Int = 64): DataFrame = {
    val spark = edges0.sparkSession
    val edges = Dedup.withAqeOff(spark) {
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("src")))
        .localCheckpoint(true)
    }
    val scc = Exec.checkpointCut(
      stronglyConnectedComponents(edges))
    // condensation sweeps at the static frame's size-derived count
    // (Exec.withShuffleParts; the SCC call above pins its own scope)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    val largest = scc.groupBy("scc").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("scc")).limit(1)
      .select(col("scc").as("__big"))
    val compEdges = Exec.checkpointCut(edges
      .join(scc.select(col("node").as("src"), col("scc").as("__cs")),
        Seq("src"))
      .join(scc.select(col("node").as("dst"), col("scc").as("__cd")),
        Seq("dst"))
      .select(col("__cs").as("src"), col("__cd").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct())
    val compRev = compEdges.select(col("dst").as("src"),
      col("src").as("dst"))
    val seed = largest.select(col("__big").as("node"))
    val fwd = reachableFrom(compEdges, seed, maxRounds)
      .withColumnRenamed("node", "scc").withColumn("__fwd", lit(true))
    val bwd = reachableFrom(compRev, seed, maxRounds)
      .withColumnRenamed("node", "scc").withColumn("__bwd", lit(true))
    scc.crossJoin(broadcast(largest))
      .join(broadcast(fwd), Seq("scc"), "left")
      .join(broadcast(bwd), Seq("scc"), "left")
      .select(col("node"),
        when(col("scc") === col("__big"), "scc")
          .when(col("__bwd"), "in")
          .when(col("__fwd"), "out")
          .otherwise("other").as("bowtie_class"))
      .groupBy("bowtie_class")
      .agg(count(lit(1)).as("n_nodes"))
    } // withShuffleParts
  }

  /** Greedy maximal matching by the locally-dominant-edge rule
    * (Preis 1999 / Manne–Bisseling): each round keeps an edge iff its
    * priority (w, u, v) is the minimum among ALL live edges at BOTH
    * endpoints, then drops every edge touching a matched vertex.
    * Priorities are a total order (u < v pairs are distinct), so the
    * result is EXACTLY the sequential greedy matching in (w, u, v)
    * order — deterministic, engine-independent. The globally-minimum
    * live edge is always locally dominant, so every round matches
    * something: ≤ min(V/2, maxRounds) rounds, typically O(log E).
    *
    * Shape at 100 TB: live edges re-checkpoint per round (dead blocks
    * freed); each round is two map-side-combined min-aggs on u / v
    * (vertex-sized), one self-join of edges against those mins, and
    * two anti-joins against the matched-vertex set (matching-sized).
    * No global order, no window, no driver data. */
  def maximalMatching(edges0: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", weightCol: String = "w",
      maxRounds: Int = 64, requireConverged: Boolean = true): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges0.sparkSession
    var live = Dedup.withAqeOff(spark) {
      edges0.select(least(col(srcCol), col(dstCol)).as("u"),
          greatest(col(srcCol), col(dstCol)).as("v"),
          col(weightCol).cast("long").as("w"))
        .filter(col("u") =!= col("v"))
        .groupBy("u", "v").agg(min("w").as("w"))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("u")))
        .localCheckpoint(true)
    }
    var matched: DataFrame = null
    var done = false
    var round = 0
    // loop at the static frame's size-derived count (Exec.withShuffleParts)
    Exec.withShuffleParts(spark, live.rdd.getNumPartitions) {
    while (!done && round < maxRounds) {
      val pri = struct(col("w"), col("u"), col("v"))
      // per-VERTEX minimum over BOTH endpoint appearances — an edge is
      // locally dominant only if it wins at u and at v
      val best = live.select(col("u").as("node"), pri.as("p"))
        .union(live.select(col("v").as("node"), pri.as("p")))
        .groupBy("node").agg(min("p").as("b"))
      val obs = org.apache.spark.sql.Observation()
      val sel = Exec.checkpointCut(live
        .join(best.select(col("node").as("u"), col("b").as("__bu")),
          Seq("u"))
        .join(best.select(col("node").as("v"), col("b").as("__bv")),
          Seq("v"))
        .filter(pri === col("__bu") && pri === col("__bv"))
        .select("u", "v", "w")
        .observe(obs, count(lit(1)).as("rows")))
      val picked = obs.get("rows").asInstanceOf[Long]
      if (picked == 0L) {
        Exec.releaseCheckpoint(sel)
        done = true
      } else {
        val mv = sel.select(col("u").as("mnode"))
          .union(sel.select(col("v")))
        val prevLive = live
        val lObs = org.apache.spark.sql.Observation()
        live = Exec.checkpointCut(live
          .join(mv.withColumnRenamed("mnode", "u"), Seq("u"), "left_anti")
          .join(mv.withColumnRenamed("mnode", "v"), Seq("v"), "left_anti")
          .select("u", "v", "w")
          .observe(lObs, count(lit(1)).as("rows")))
        Exec.releaseCheckpoint(prevLive)
        matched = if (matched == null) sel else matched.union(sel)
        round += 1
        if (lObs.get("rows").asInstanceOf[Long] == 0L) done = true
      }
    }
    require(!requireConverged || done,
      s"maximal matching did not converge within $maxRounds rounds")
    if (matched == null) live.limit(0)
    else matched.select("u", "v", "w")
    } // withShuffleParts
  }
}
