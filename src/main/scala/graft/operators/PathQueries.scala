package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The k-hop path-pattern query engine — the reference's entire external
 * query surface, re-expressed as chained equi-joins (SURVEY.md §2.7).
 *
 * Reference semantics (src/main/java/gov/nih/nlm/AqlQuerySetBuilder.java):
 *  - every query anchors at a start collection and walks k hops in ANY
 *    (undirected) direction (`FOR v,e,p IN k ANY cs GRAPH`, lines 28-65);
 *  - each path position i is constrained to one vertex collection
 *    (`IS_SAME_COLLECTION(@nodeI, p.vertices[i])`, lines 36-37);
 *  - no edge repeats within one path (AQL default `uniqueEdges: "path"`);
 *  - the optional hierarchy extension walks OUTBOUND over a single edge
 *    label up to depth 64 from the path's last vertex and keeps only the
 *    LONGEST chain per start (`SORT LENGTH(p1.edges) DESC LIMIT 1`,
 *    lines 88-119).
 *
 * Spark-first design:
 *  - ANY direction = union of the edge table with its reverse — built once;
 *  - per-hop collection constraints become filters on the edge table's
 *    partition columns BEFORE the join ⇒ Parquet partition pruning, and the
 *    per-hop join only shuffles the one collection-pair slice it needs;
 *  - `uniqueEdges: path` = an accumulated set of undirected edge ids checked
 *    with array_contains (k ≤ 5, so the array is tiny);
 *  - the hierarchy BFS is an iterative DataFrame loop with early exit on an
 *    empty frontier and localCheckpoint every few iterations to cut lineage
 *    (depth cap 64, AqlQuerySetBuilder.java:96);
 *  - longest-per-start = max_by over (path, chain length) — one hash agg,
 *    not a sort.
 *
 * At 100 TB: the anchor collection (CS in the reference) is tiny and the
 * hop-1 join broadcasts it; ontology-sized collections shuffle on
 * (collection, key), which is exactly the layout the partitioned edge table
 * already has.
 */
object PathQueries {

  /** One hop constraint: the vertex collection required at that position. */
  type Hop = String

  /** Undirected view of an edge table: each edge appears in both
    * orientations, tagged with a canonical undirected id for
    * `uniqueEdges: path` enforcement and its orientation ('f'/'r') so a
    * directed (OUTBOUND) view can be recovered from a persisted copy. */
  def undirected(edges: DataFrame): DataFrame = {
    val eid = concat_ws("|",
      col("from_coll"), col("from_key"), col("to_coll"), col("to_key"))
    val fwd = edges.select(
      col("from_coll").as("src_coll"), col("from_key").as("src_key"),
      col("to_coll").as("dst_coll"), col("to_key").as("dst_key"),
      col("label"), eid.as("eid"), lit("f").as("orient"))
    val rev = edges.select(
      col("to_coll").as("src_coll"), col("to_key").as("src_key"),
      col("from_coll").as("dst_coll"), col("from_key").as("dst_key"),
      col("label"), eid.as("eid"), lit("r").as("orient"))
    fwd.unionByName(rev)
  }

  /**
   * k-hop ANY path enumeration with per-position collection constraints.
   * Mirrors getQuerySetInOne/Two/Three/Four/Five
   * (AqlQuerySetBuilder.java:28-351).
   *
   * @param vertices  vertex table (collection, key, ...)
   * @param edges     edge table (from_coll, to_coll, from_key, to_key, label)
   * @param anchor    start collection (always "CS" in the reference's 24
   *                  production queries, PhenotypeGraphBuilder.java:50-92)
   * @param hops      required collection at positions 1..k
   * @return paths DataFrame: vertices array<struct<collection,key>>,
   *         edges array<struct<from_coll,from_key,to_coll,to_key,label>>
   */
  def kHop(vertices: DataFrame, edges: DataFrame, anchor: String, hops: Seq[Hop]): DataFrame = {
    require(hops.nonEmpty && hops.size <= 5, "reference queries are 1..5 hops")
    val eAny = undirected(edges)

    val vref = (c: String, k: String) =>
      struct(col(c).as("collection"), col(k).as("key"))

    // `uniqueEdges: path` tracking is only needed when the collection
    // pattern can revisit an edge: the edge into hop i connects
    // collections (hop(i-1), hop(i)), so a repeat is only possible at a
    // later hop j with {hop(j-1), hop(j)} == {hop(i-1), hop(i)} (ANY
    // direction = unordered). When the pattern can't repeat (most of the
    // reference's 24 production queries), skip carrying+checking the eid
    // array entirely — less shuffle payload per path row.
    val collAt: Int => String = i => if (i < 0) anchor else hops(i)
    val pairs = hops.indices.map(i => Set(collAt(i - 1), collAt(i)))
    val needEids = pairs.distinct.size < pairs.size

    // start frontier: every vertex of the anchor collection
    var paths = {
      val base = vertices.filter(col("collection") === anchor)
        .select(
          array(struct(col("collection"), col("key"))).as("vs"),
          array().cast("array<struct<from_coll:string,from_key:string,to_coll:string,to_key:string,label:string>>").as("es"),
          col("collection").as("cur_coll"), col("key").as("cur_key"))
      if (needEids) base.withColumn("eids", array().cast("array<string>"))
      else base
    }

    hops.foreach { hopColl =>
      // constrain the edge slice BEFORE the join: partition-prunable
      val slice = eAny.filter(col("dst_coll") === hopColl)
      val joined = paths.join(slice,
          paths("cur_coll") === slice("src_coll") &&
          paths("cur_key") === slice("src_key"))
      val filtered =
        if (needEids) joined.filter(!array_contains(col("eids"), col("eid")))
        else joined
      val grown = filtered.select(
        Seq(
          concat(col("vs"), array(vref("dst_coll", "dst_key"))).as("vs"),
          concat(col("es"), array(struct(
            col("src_coll").as("from_coll"), col("src_key").as("from_key"),
            col("dst_coll").as("to_coll"), col("dst_key").as("to_key"),
            col("label")))).as("es"),
          col("dst_coll").as("cur_coll"), col("dst_key").as("cur_key")) ++
        (if (needEids) Seq(concat(col("eids"), array(col("eid"))).as("eids"))
         else Nil): _*)
      paths = grown
    }
    paths.select(col("vs").as("vertices"), col("es").as("edges"))
  }

  /**
   * k-hop ANY path enumeration over the bucketed hop-table layout written
   * by `GraphStore.writeHopTables` — the 100 TB-scale variant of [[kHop]]:
   * the (huge) edge table NEVER shuffles.
   *
   * Layout contract: `<prefix>_by_src` and `<prefix>_by_dst` are the same
   * undirected edge view, bucketed+sorted by (src_coll, src_key) and
   * (dst_coll, dst_key) respectively with equal bucket counts.
   *
   *  - hop 1 is just the `by_dst` scan (src_coll = anchor): its rows
   *    arrive hash-partitioned on (dst_coll, dst_key) — which IS hop 2's
   *    join key, so a 2-hop plan runs with ZERO shuffle exchanges
   *    (plan-asserted in QueryCatalogSpec);
   *  - every later hop reads `by_src`, already partitioned on its join
   *    key: only the (small, growing) path side ever re-shuffles, the
   *    edge scan side never does.
   *
   * Requires every edge endpoint to exist in the vertex table (true for
   * GraphStore-written graphs), under which it is result-identical to
   * [[kHop]] (spec-pinned). */
  def kHopBucketed(spark: SparkSession, prefix: String, anchor: String,
                   hops: Seq[Hop]): DataFrame = {
    require(hops.nonEmpty && hops.size <= 5, "reference queries are 1..5 hops")
    val bySrc = spark.table(s"${prefix}_by_src")
    val byDst = spark.table(s"${prefix}_by_dst")

    val collAt: Int => String = i => if (i < 0) anchor else hops(i)
    val pairSets = hops.indices.map(i => Set(collAt(i - 1), collAt(i)))
    val needEids = pairSets.distinct.size < pairSets.size

    val h1 = byDst.filter(col("src_coll") === anchor &&
      col("dst_coll") === hops.head)
    var paths = {
      val base = h1.select(
        Seq(
          array(
            struct(col("src_coll").as("collection"), col("src_key").as("key")),
            struct(col("dst_coll").as("collection"), col("dst_key").as("key"))).as("vs"),
          array(struct(
            col("src_coll").as("from_coll"), col("src_key").as("from_key"),
            col("dst_coll").as("to_coll"), col("dst_key").as("to_key"),
            col("label"))).as("es"),
          col("dst_coll").as("cur_coll"), col("dst_key").as("cur_key")) ++
        (if (needEids) Seq(array(col("eid")).as("eids")) else Nil): _*)
      base
    }
    hops.drop(1).zipWithIndex.foreach { case (hopColl, i0) =>
      val slice = bySrc.filter(col("src_coll") === hops(i0) &&
        col("dst_coll") === hopColl)
      val joined = paths.join(slice,
        paths("cur_coll") === slice("src_coll") &&
        paths("cur_key") === slice("src_key"))
      val filtered =
        if (needEids) joined.filter(!array_contains(col("eids"), col("eid")))
        else joined
      paths = filtered.select(
        Seq(
          concat(col("vs"), array(struct(
            col("dst_coll").as("collection"), col("dst_key").as("key")))).as("vs"),
          concat(col("es"), array(struct(
            col("src_coll").as("from_coll"), col("src_key").as("from_key"),
            col("dst_coll").as("to_coll"), col("dst_key").as("to_key"),
            col("label")))).as("es"),
          col("dst_coll").as("cur_coll"), col("dst_key").as("cur_key")) ++
        (if (needEids) Seq(concat(col("eids"), array(col("eid"))).as("eids"))
         else Nil): _*)
    }
    paths.select(col("vs").as("vertices"), col("es").as("edges"))
  }

  /**
   * Variable-length hierarchy extension (getQuerySetIn*WithHierarchy,
   * AqlQuerySetBuilder.java:88-119): from each path's last vertex, walk
   * OUTBOUND over edges of ONE label up to `maxDepth`, keep the longest
   * chain per path, and concat it onto the base path.
   *
   * The AQL `PRUNE label NOT IN [@label]` + `FILTER ALL ==` pair is
   * equivalent to pre-filtering the edge table to the single label before
   * the walk (SURVEY.md §4) — simpler and prunes at the scan.
   */
  def withHierarchy(basePaths: DataFrame, edges: DataFrame, label: String,
                    maxDepth: Int = 64): DataFrame = {
    // the single-label slice is read once per BFS level — materialize it
    // eagerly (localCheckpoint, ContextCleaner-reclaimed — not a leaked
    // CacheManager entry) and, when it is broadcast-sized, pin it to the
    // broadcast side so the frontier never shuffles between levels. The
    // gate is estimated BYTES against the session's own
    // autoBroadcastJoinThreshold (a row-count gate would happily broadcast
    // hundreds of MB of long keys and OOM the driver at scale). When the
    // slice EXCEEDS the gate, prefer [[withHierarchyBucketed]]: there the
    // slice is a bucketed scan already partitioned on the join key, so it
    // never re-shuffles per level either.
    val hier0 = edges.filter(col("label") === label)
      .select(col("from_coll"), col("from_key"), col("to_coll"),
        col("to_key"), col("label"))
      .localCheckpoint(true)
    val sz = hier0.agg(
      count(lit(1)).as("n"),
      coalesce(sum(length(concat_ws("", col("from_coll"), col("from_key"),
        col("to_coll"), col("to_key"), col("label")))), lit(0L)).as("chars"))
      .head()
    // UTF-16 string payload + ~48 B per-row struct/field overhead
    val estBytes = sz.getLong(1) * 2 + sz.getLong(0) * 48
    val confStr = basePaths.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val threshold =
      if (confStr.trim.startsWith("-")) -1L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(confStr)
    val hier = if (threshold > 0 && estBytes <= threshold) broadcast(hier0)
               else hier0
    hierarchyLoop(basePaths, hier, maxDepth)
  }

  /** [[withHierarchy]] over the bucketed `<prefix>_by_src` hop table
    * (GraphStore.writeHopTables layout) — the 100 TB variant: the
    * single-label directed slice (`orient = 'f'`, label pushed to the
    * scan) arrives hash-partitioned on its join key from the bucketing,
    * so the edge side NEVER shuffles at any BFS level no matter how far
    * past the broadcast gate the label slice grows; only the (small)
    * frontier moves. Result ≡ [[withHierarchy]] on the directed view
    * (spec-pinned); per-level edge-side shuffle-freedom is plan-asserted
    * in QueryCatalogSpec via [[hierarchyStep]]. */
  def withHierarchyBucketed(spark: SparkSession, prefix: String,
                            basePaths: DataFrame, label: String,
                            maxDepth: Int = 64): DataFrame = {
    val hier = spark.table(s"${prefix}_by_src")
      .filter(col("orient") === "f" && col("label") === label)
      .select(col("src_coll").as("from_coll"), col("src_key").as("from_key"),
        col("dst_coll").as("to_coll"), col("dst_key").as("to_key"),
        col("label"))
    hierarchyLoop(basePaths, hier, maxDepth)
  }

  /** One BFS level: extend every frontier chain by one `hier` edge.
    * Separated so specs can plan-assert the per-level join (the loop's
    * eager localCheckpoint hides the join plan from the outside). The
    * projection aliases keep the bucketed scan's (src_coll, src_key)
    * partitioning attached to (from_coll, from_key) — Spark's
    * alias-aware output partitioning — which is what makes the bucketed
    * variant's per-level join edge-shuffle-free. */
  private[graft] def hierarchyStep(frontier: DataFrame, hier: DataFrame): DataFrame =
    frontier.join(hier,
        frontier("cur_coll") === hier("from_coll") &&
        frontier("cur_key") === hier("from_key"))
      .select(
        col("pid"),
        concat(col("tvs"), array(struct(
          col("to_coll").as("collection"), col("to_key").as("key")))).as("tvs"),
        concat(col("tes"), array(struct(
          col("from_coll"), col("from_key"), col("to_coll"), col("to_key"),
          col("label")))).as("tes"),
        col("to_coll").as("cur_coll"), col("to_key").as("cur_key"))

  private def hierarchyLoop(basePaths: DataFrame, hier: DataFrame,
                            maxDepth: Int): DataFrame =
    hierarchyLoopThin(basePaths, hier, maxDepth)

  /** The original array-carrying walk, kept as the THIN loop's
    * equivalence witness (spec-pinned identical on forked, capped, and
    * non-extendable fixtures). Its scale flaw, measured at the sf10
    * two-decade rehearsal: every level localCheckpoints the FULL
    * growing (tvs, tes) tail arrays and the winner pick unions every
    * level's array rows — at 2.9 M paths × 4 levels the walk cost 64 s
    * warm while the 3-hop base join took 1.6 s. The thin loop carries
    * ~32 B/row frontiers instead and assembles arrays exactly once. */
  private[graft] def hierarchyLoopDense(basePaths: DataFrame, hier: DataFrame,
                            maxDepth: Int): DataFrame = {
    val base = basePaths
      .withColumn("pid", monotonically_increasing_id())
      .withColumn("cur_coll", element_at(col("vertices"), -1).getField("collection"))
      .withColumn("cur_key", element_at(col("vertices"), -1).getField("key"))
      .localCheckpoint(true)

    // frontier: pid → growing tail; keep only still-extendable chains
    var frontier = base.select(
      col("pid"),
      array().cast("array<struct<collection:string,key:string>>").as("tvs"),
      array().cast("array<struct<from_coll:string,from_key:string,to_coll:string,to_key:string,label:string>>").as("tes"),
      col("cur_coll"), col("cur_key"))

    // tails per level (level 0 = the empty tail, so every pid survives);
    // the longest-per-start winner is picked ONCE after the loop instead
    // of re-aggregating every level
    var levels = List(frontier.select(col("pid"), col("tvs"), col("tes")))
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      // the row count rides the checkpoint job as an observe metric —
      // ONE job per level, not a checkpoint job plus an isEmpty job
      // (at depth 64 the scheduling overhead of the second job is the
      // dominant cost of the whole walk — measured 16.3 → 8.1 s on the
      // q233 80-node chain at sf0.01)
      val obs = org.apache.spark.sql.Observation()
      val step = hierarchyStep(frontier, hier)
        .observe(obs, count(lit(1)).as("rows"))
        .localCheckpoint(true) // cut lineage each level (depth ≤ 64)
      if (obs.get("rows").asInstanceOf[Long] == 0L) done = true
      else {
        levels ::= step.select(col("pid"), col("tvs"), col("tes"))
        frontier = step
        depth += 1
      }
    }
    // longest-per-start: a longer tail always supersedes (W2 — SORT
    // LENGTH DESC LIMIT 1). Among equal-length tails AQL keeps an
    // arbitrary one; max_by keeps determinism-enough semantics.
    val best = levels.reduce(_.unionByName(_))
      .groupBy("pid")
      .agg(max_by(struct(col("tvs"), col("tes")), size(col("tes"))).as("t"))
      .select(col("pid"), col("t.tvs").as("tvs"), col("t.tes").as("tes"))
    base.join(best, Seq("pid"))
      .select(
        concat(col("vertices"), col("tvs")).as("vertices"),
        concat(col("edges"), col("tes")).as("edges"))
  }

  /** Thin-frontier hierarchy walk — result ≡ [[hierarchyLoopDense]]
    * (same longest-per-start, same ≤`maxDepth` cap, arbitrary winner
    * among equal-length forks), restructured so the heavy string-struct
    * tail arrays never move during the iteration:
    *
    *  - each level checkpoints a THIN log row (bid, pid, edge fields) —
    *    `bid` is the per-level branch id (fork-safe: a node with two
    *    label successors forks into two branches);
    *  - the frontier carries (bid, pid, cur, bid_path) where bid_path
    *    is a LONG ARRAY of the branch ids taken so far — 8 B per level
    *    versus the dense loop's ~200 B of tail structs per level, and
    *    it exists only in the frontier, never in the logs;
    *  - the winner per pid is the max-level frontier snapshot (max_by —
    *    arbitrary among equal-length forks, the dense convention);
    *  - winner tails reconstruct in ONE posexplode of bid_path joined
    *    against the level-tagged log union — constant plan depth (the
    *    first thin cut walked parents backward through depth chained
    *    lazy joins, and the O(depth²) plan OOM'd the q233 depth-64
    *    gate at analysis time);
    *  - tails become arrays in ONE sort_array(collect_list) pass and
    *    join back to the checkpointed base.
    *
    * Scale shape: per-level checkpoint and shuffle bytes drop from
    * O(paths × tail structs) to O(extensions × ~100 B) + the long-array
    * frontier; the winner pick shuffles thin rows instead of every
    * level's arrays. Measured at the sf10 rehearsal (2.9 M paths, 4
    * levels, local[32]): the q82 walk fell from 64 s (dense) to ~9 s.
    * The per-level job count is unchanged (one observed checkpoint per
    * level — the q233 single-job discipline).
    *
    * Depth lever CLOSED as not-needed (round 10): on a FUNCTIONAL label
    * slice the walk is still one job per level (the depth-64 gate pays
    * 64 scheduling rounds, ~0.1 s each); pointer doubling would reach a
    * depth-d cap in ⌈log₂ d⌉ rounds, at the cost of a jump-table
    * reconstruction for the emitted tails. Measured chain depths of the
    * reference's committed ontology fixtures (`Scratch obodepth`,
    * PLANS.md round 10): macrophage.owl (the CL extract) maxDepth 9,
    * ro.owl maxDepth 7 — and the production walks cap at 64. At d ≤ 64
    * the doubling saves at most ~5 s of scheduling on a degenerate
    * chain while complicating every emitted tail; revisit only if a
    * workload's hierarchies push d well past the cap. */
  private[graft] def hierarchyLoopThin(basePaths: DataFrame, hier: DataFrame,
                                       maxDepth: Int): DataFrame = {
    val base = basePaths
      .withColumn("pid", monotonically_increasing_id())
      .withColumn("cur_coll", element_at(col("vertices"), -1).getField("collection"))
      .withColumn("cur_key", element_at(col("vertices"), -1).getField("key"))
      .localCheckpoint(true)

    // fork detection, ONCE up front: when no node has two label
    // successors (SUB_CLASS_OF/PART_OF slices are near-trees — the
    // common case), every pid has exactly one branch, so the winner
    // machinery (bid paths, max_by, posexplode+join) is unnecessary:
    // a pid's tail IS its log rows. One map-side-combined aggregate
    // over the label slice.
    val functional = hier
      .groupBy(col("from_coll"), col("from_key"))
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(max(col("__n")), lit(0L)).as("m"))
      .head().getLong(0) <= 1L

    // level-0 frontier: empty bid path (omitted on the fork-free path)
    var frontier = base.select(col("pid"),
      array().cast("array<long>").as("bid_path"),
      col("cur_coll"), col("cur_key"))
    var logs = List.empty[DataFrame]      // thin (pid, bid, v, e) per level
    var snaps = List.empty[DataFrame]     // frontier snapshots per level
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      val obs = org.apache.spark.sql.Observation()
      // one observed checkpoint per level (the q233 single-job rule);
      // the checkpoint also pins this level's monotonically_increasing
      // branch ids so logs and snapshots agree
      val step = frontier.join(hier,
          frontier("cur_coll") === hier("from_coll") &&
          frontier("cur_key") === hier("from_key"))
        .select(monotonically_increasing_id().as("bid"), col("pid"),
          col("bid_path"),
          col("from_coll"), col("from_key"), col("to_coll"), col("to_key"),
          col("label"))
        // referencing the bid COLUMN (not a second monotonically_
        // increasing_id() call, which would generate different ids)
        .withColumn("bid_path",
          if (functional) col("bid_path") // unused: skip the array append
          else concat(col("bid_path"), array(col("bid"))))
        .observe(obs, count(lit(1)).as("rows"))
        .localCheckpoint(true)
      if (obs.get("rows").asInstanceOf[Long] == 0L) done = true
      else {
        logs ::= step.select(col("pid"), col("bid"),
          struct(col("to_coll").as("collection"), col("to_key").as("key"))
            .as("v"),
          struct(col("from_coll"), col("from_key"), col("to_coll"),
            col("to_key"), col("label")).as("e"))
        snaps ::= step.select(col("pid"), col("bid_path"))
        frontier = step.select(col("pid"), col("bid_path"),
          col("to_coll").as("cur_coll"), col("to_key").as("cur_key"))
        depth += 1
      }
    }
    if (logs.isEmpty)
      return base.select(col("vertices"), col("edges"))
    val byLevel = logs.reverse.zipWithIndex.map { case (l, i) => (i + 1, l) }
    val logAll = byLevel.map { case (lvl, l) =>
        l.select(col("pid"), lit(lvl).as("level"), col("bid"), col("v"),
          col("e")) }
      .reduce(_.unionByName(_))
    val winnerRows =
      if (functional) logAll // one branch per pid: every log row is tail
      else {
        // winner per pid: longest bid path (arbitrary among ties —
        // max_by), then ONE posexplode + ONE join reconstructs it from
        // the level-tagged log union — constant plan depth
        val winners = snaps.reverse.zipWithIndex.map { case (s, i) =>
            s.select(col("pid"), lit(i + 1).as("level"), col("bid_path")) }
          .reduce(_.unionByName(_))
          .groupBy("pid")
          .agg(max_by(col("bid_path"), col("level")).as("bid_path"))
        winners
          .select(col("pid"),
            posexplode(col("bid_path")).as(Seq("pos", "bid")))
          .withColumn("level", col("pos") + 1)
          .join(logAll.drop("pid"), Seq("level", "bid"))
      }
    val tails = winnerRows
      .groupBy("pid")
      .agg(sort_array(collect_list(struct(col("level"), col("v"),
        col("e")))).as("t"))
      .select(col("pid"),
        transform(col("t"), x => x.getField("v")).as("tvs"),
        transform(col("t"), x => x.getField("e")).as("tes"))
    base.join(tails, Seq("pid"), "left")
      .select(
        concat(col("vertices"), coalesce(col("tvs"),
          array().cast("array<struct<collection:string,key:string>>")))
          .as("vertices"),
        concat(col("edges"), coalesce(col("tes"),
          array().cast("array<struct<from_coll:string,from_key:string," +
            "to_coll:string,to_key:string,label:string>>")))
          .as("edges"))
  }

  /**
   * Phenotype-subgraph materialization (PhenotypeGraphBuilder.java:117-157):
   * union of path results → unique vertex refs and edge refs. The
   * reference's O(n²) List.contains dedup becomes a hash dropDuplicates.
   */
  def subgraph(paths: DataFrame): (DataFrame, DataFrame) = {
    val vs = paths.select(explode(col("vertices")).as("v"))
      .select(col("v.collection"), col("v.key"))
      .dropDuplicates("collection", "key")
    val es = paths.select(explode(col("edges")).as("e"))
      .select(col("e.from_coll"), col("e.from_key"), col("e.to_coll"),
        col("e.to_key"), col("e.label"))
      .dropDuplicates()
    (vs, es)
  }

  /** Vertex-doc enrichment preference join (J11,
    * PhenotypeGraphBuilder.java:178-191): take the ontology-DB doc when it
    * exists, else keep the path doc. */
  def enrich(pathVerts: DataFrame, ontologyVerts: DataFrame): DataFrame = {
    val o = ontologyVerts.select(
      col("collection"), col("key"),
      col("term").as("o_term"), col("attrs").as("o_attrs"))
    pathVerts.join(o, Seq("collection", "key"), "left")
      .select(col("collection"), col("key"),
        coalesce(col("o_term"),
          concat_ws("_", col("collection"), col("key"))).as("term"),
        col("o_attrs").as("attrs"))
  }
}
