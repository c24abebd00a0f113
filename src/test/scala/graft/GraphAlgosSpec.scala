package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphAlgos

class GraphAlgosSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> c, c -> a
  private def diamond = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("pageRank: one-iteration closed form on the diamond graph " +
    "(GraphX convention, no dangling redistribution)") {
    val d = 0.85
    val base = 1.0 - d
    val got = GraphAlgos.pageRank(diamond, iterations = 1)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // outdeg: 1 -> 2, 2 -> 1, 3 -> 1; all ranks start at 1.0
    assert(got(0) == (1L -> (base + d * (1.0 / 1))))      // from c
    assert(got(1) == (2L -> (base + d * (1.0 / 2))))      // from a
    assert(got(2) == (3L -> (base + d * (1.0 / 2 + 1.0 / 1)))) // a then b
  }

  test("pageRank: five iterations are bit-deterministic across runs and " +
    "rank the hub above the spokes") {
    // star with back-edges: every spoke points at the hub, hub points back
    val star = ((1L to 6L).map(i => (i + 10L, 1L)) ++
      (1L to 6L).map(i => (1L, i + 10L))).toDF("src", "dst")
    val a = GraphAlgos.pageRank(star, iterations = 5, exactFolds = true)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = GraphAlgos.pageRank(star, iterations = 5, exactFolds = true)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b) // exact bit equality, not approximate
    val ranks = a.toMap
    assert((11L to 16L).forall(sp => ranks(1L) > ranks(sp)),
      s"hub must out-rank spokes: $ranks")
    // spokes are symmetric: identical ranks
    assert((12L to 16L).forall(sp => ranks(sp) == ranks(11L)))
  }

  test("personalized pageRank: reset mass confined to seeds, " +
    "unreachable nodes stay at exactly zero") {
    // chain 1 -> 2 -> 3, island 9 -> 10; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d = 0.85
    val base = 1.0 - d
    val got = GraphAlgos.personalizedPageRank(edges, seeds, iterations = 2)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // iter1: pr(1)=base, pr(2)=d*1, pr(3)=d*0=0, island 0
    // iter2: pr(1)=base, pr(2)=d*base, pr(3)=d*(d*1)
    assert(got(1L) == base)
    assert(got(2L) == d * base)
    assert(got(3L) == d * (d * 1.0))
    assert(got(9L) == 0.0 && got(10L) == 0.0)
    // the uniform face stays the old pageRank: every node seeded
    val uni = GraphAlgos.pageRank(edges, iterations = 2).orderBy("node")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(10L) > 0.0 && uni(1L) == base)
  }

  test("weightedPageRank: uniform weights equal the unweighted face, " +
    "skewed weights shift mass to the heavy edge") {
    val uni = diamond.withColumn("w", lit(7L))
    val a = GraphAlgos.weightedPageRank(uni, iterations = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = GraphAlgos.pageRank(diamond, iterations = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // same split ratios -> same ranks (7/14 = 1/2 exactly in binary)
    assert(a.toSeq == b.toSeq)
    // node 1 splits 3:1 toward node 2 -> node 2 must now out-rank the
    // uniform-split value, node 3 fall below it
    val sk = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val w = GraphAlgos.weightedPageRank(sk, iterations = 3)
      .orderBy("node").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val u = b.toMap
    assert(w(2L) > u(2L) && w(3L) < u(3L))
  }

  test("hits: one-round closed form on the diamond, normalization " +
    "preserves ranking with max pinned to 1") {
    // diamond: 1->2, 1->3, 2->3, 3->1; hubs start at 1
    // round 1: auth(1)=h(3)=1; auth(2)=h(1)=1; auth(3)=h(1)+h(2)=2
    //          hub(1)=a(2)+a(3)=3; hub(2)=a(3)=2; hub(3)=a(1)=1
    val got = GraphAlgos.hits(diamond, iterations = 1)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 3.0, 1.0), (2L, 2.0, 1.0), (3L, 1.0, 2.0)))
    val norm = GraphAlgos.hits(diamond, iterations = 1, normalize = true)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(norm.toSeq == Seq((1L, 1.0, 0.5), (2L, 2.0 / 3, 0.5),
      (3L, 1.0 / 3, 1.0)))
  }

  test("weighted hits: uniform weights equal the unweighted face, " +
    "one-round closed form with a skewed weight") {
    // weight 1 everywhere: w·hub = hub bitwise, so the weighted path
    // must reproduce the unweighted one exactly
    val uni = diamond.withColumn("w", lit(1L))
    val a = GraphAlgos.hits(uni, iterations = 2, weightCol = Some("w"))
      .orderBy("node").collect().toSeq
    val b = GraphAlgos.hits(diamond, iterations = 2)
      .orderBy("node").collect().toSeq
    assert(a == b) // weight 1: bitwise-identical to unweighted
    // skew edge 1->2 with weight 3 (others 1):
    // round 1: auth(1)=h3=1, auth(2)=3·h1=3, auth(3)=h1+h2=2
    //          hub(1)=3·a2+a3=11, hub(2)=a3=2, hub(3)=a1=1
    val sk = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = GraphAlgos.hits(sk, iterations = 1, weightCol = Some("w"),
        exactFolds = true)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 11.0, 1.0), (2L, 2.0, 3.0), (3L, 1.0, 2.0)))
  }

  test("eigenvector centrality: closed form on the diamond, max-normalized " +
    "each round, source-only nodes decay to zero") {
    // diamond: 1->2, 1->3, 2->3, 3->1; x0 = 1
    // round 1 sums: s(1)=x3=1, s(2)=x1=1, s(3)=x1+x2=2; max=2
    //  -> x1 = (0.5, 0.5, 1.0)
    // round 2 sums: s(1)=1.0, s(2)=0.5, s(3)=0.5+0.5=1.0; max=1.0
    //  -> x2 = (1.0, 0.5, 1.0)
    val got = GraphAlgos.eigenvectorCentrality(diamond, iterations = 2,
        exactFolds = true)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 0.5), (3L, 1.0)))
    // a pure source (no in-edges) holds score 0 after round 1
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val c = GraphAlgos.eigenvectorCentrality(chain, iterations = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(c(0) == (1L, 0.0))
  }

  test("shortestPaths: multi-landmark BFS distances, hop cap respected, " +
    "unreachable pairs absent, early convergence exact") {
    // chain 1->2->3->4, shortcut 1->4, island 9->10; landmarks {1, 9}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val lm = Seq(1L, 9L).toDF("node")
    val got = GraphAlgos.shortestPaths(edges, lm, maxHops = 6)
      .orderBy("node", "landmark").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, 0), (2L, 1L, 1), (3L, 1L, 2),
      (4L, 1L, 1), // the shortcut beats the chain's 3
      (9L, 9L, 0), (10L, 9L, 1)))
    // cap below the chain depth drops only the too-far pair
    val capped = GraphAlgos.shortestPaths(edges, lm, maxHops = 1)
      .orderBy("node", "landmark").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(capped.toSeq == Seq(
      (1L, 1L, 0), (2L, 1L, 1), (4L, 1L, 1), (9L, 9L, 0), (10L, 9L, 1)))
  }

  test("shortestPaths round stays expression-native: no row-typed lambda, " +
    "improvement count rides the round's own action as an observation") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val dists = Seq((1L, 1L, 0)).toDF("node", "landmark", "dist")
    val (updated, obs) = GraphAlgos.spRound(edges, dists)
    val plan = updated.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      s"round plan fell out of codegen:\n$plan")
    assert(plan.contains("CollectMetrics"),
      s"observation node missing from round plan:\n$plan")
    // the checkpoint action both materializes the round AND resolves the
    // observation — exactly one pass over the merged frame
    val out = updated.localCheckpoint(true)
    assert(obs.get("improved").asInstanceOf[Long] == 1L) // pair (2,1) new
    assert(out.count() == 2L)
  }

  test("exactFolds=false (the celebrity-node 100 TB path) matches the " +
    "sorted-fold face within float association noise, plan has no " +
    "collect_list") {
    // denser random-ish graph so sums have many terms
    val edges = (0L until 400L).map(i =>
      ((i * 7) % 40, (i * 11 + 3) % 40)).distinct.toDF("src", "dst")
    val exact = GraphAlgos.pageRank(edges, iterations = 4, exactFolds = true)
      .orderBy("node").collect().map(r => r.getLong(0) -> r.getDouble(1))
    val fast = GraphAlgos.pageRank(edges, iterations = 4, exactFolds = false)
      .orderBy("node").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(exact.map(_._1).toSeq == fast.map(_._1).toSeq)
    exact.zip(fast).foreach { case ((n, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-12 * math.max(math.abs(a), 1.0),
        s"node $n: exact $a vs fast $b")
    }
    val hExact = GraphAlgos.hits(diamond, iterations = 2, exactFolds = true)
      .orderBy("node").collect().toSeq
    val hFast = GraphAlgos.hits(diamond, iterations = 2, exactFolds = false)
      .orderBy("node").collect().toSeq
    assert(hExact == hFast) // tiny sums: identical even bitwise
  }

  test("triangleCounts: closed forms on K4 and square-with-diagonal, " +
    "direction/parallel/self edges collapse, matches a driver reference " +
    "on a random graph") {
    // K4: each node is in C(3,2) = 3 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val gotK4 = GraphAlgos.triangleCounts(k4).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotK4.toSeq == (1L to 4L).map(_ -> 3L))
    // square 1-2-3-4 + diagonal 1-3: triangles {1,2,3} and {1,3,4};
    // noisy input: reversed duplicates, a parallel edge, a self-loop
    val sq = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L),
      (3L, 1L), (1L, 3L), (2L, 2L)).toDF("src", "dst")
    val gotSq = GraphAlgos.triangleCounts(sq).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(gotSq.toSeq == Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
    // random graph vs a driver-side brute-force reference
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val got = GraphAlgos.triangleCounts(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val es = pairs.toSet
    val ref = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      (a, b) <- pairs; c <- 0L until 25L
      if c != a && c != b &&
        es.contains((math.min(a, c), math.max(a, c))) &&
        es.contains((math.min(b, c), math.max(b, c))) && b < c
    } { ref(a) += 1; ref(b) += 1; ref(c) += 1 }
    assert(got == ref.toMap)
  }

  test("pageRank iteration never re-shuffles the edge table") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // structural slice of one pageRank round, mirroring the operator
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edges =
        try diamond.select(col("src"), col("dst")).distinct()
          .repartition(col("src")).localCheckpoint(true)
        finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      val ranks = edges.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1.0))
      val sums = edges.join(deg, "src")
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), col("src"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(sum("c").as("s"))
      val plan = sums.queryExecution.executedPlan.toString
      // the checkpointed edges carry hashpartitioning(src) into the deg
      // aggregation AND both src joins — no exchange anywhere re-keys
      // the |E|-sized side on src
      val srcEx = plan.linesIterator
        .count(_.contains("Exchange hashpartitioning(src"))
      assert(srcEx == 0, s"edge side must not re-shuffle:\n$plan")
      // the only exchanges are rank-table-sized: the contribution
      // aggregation, plus at most a ranks-side re-key (here even that
      // one vanishes — ranks derive their partitioning from src)
      val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(n >= 1 && n <= 2,
        s"expected only |V|-sized exchanges, got $n:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pageRank/scc/kShell PRODUCTION rounds never re-shuffle the edge " +
       "side under a conf ≠ the size-derived count (r14 verdict item 2)") {
    // Executed-plan capture of the REAL operators (no inline replicas):
    // session conf = 4, adaptiveParts = 1 on these tiny frames — the
    // mismatch regime. Every per-round action must keep its |E|-sized
    // frame un-reshuffled (src/u/v keys); only |V|-sized label/rank
    // exchanges are allowed.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          ns: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    def drain(): Seq[String] = {
      var last = -1
      while (plans.size() != last) { last = plans.size(); Thread.sleep(400) }
      import scala.jdk.CollectionConverters._
      val out = plans.asScala.toSeq
      plans.clear()
      out
    }
    def offenders(ps: Seq[String], keys: Seq[String]): Seq[String] = {
      // single-key exchanges only: the one-time prep distinct legitimately
      // exchanges on the COMPOSITE (src, dst)/(u, v) key before the
      // repartition; the per-round offense re-keys the frame on the one
      // join column
      val res = keys.map(k =>
        (s"Exchange hashpartitioning\\($k#\\d+L?, \\d+\\), " +
          "ENSURE_REQUIREMENTS").r)
      ps.zipWithIndex.flatMap { case (p, i) =>
        p.linesIterator.filter(l => res.exists(_.findFirstIn(l).isDefined))
          .map(l => s"action $i: ${l.trim.take(120)}")
      }
    }
    spark.listenerManager.register(listener)
    try {
      val rnd = new scala.util.Random(13)
      val edges = (1 to 300).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }.toDF("src", "dst")
        .localCheckpoint(true)
      plans.clear()
      GraphAlgos.pageRank(edges, iterations = 3, exactFolds = true).count()
      val pr = offenders(drain(), Seq("src"))
      assert(pr.isEmpty, "pageRank re-shuffled the edge side:\n" +
        pr.mkString("\n"))
      // (scc/kCore/kShell are NOT line-asserted here: scc's trim renames
      // the |V|-sized node set to u/v for its semi-joins, so u/v-keyed
      // exchange lines are ambiguous, and the peels legitimately re-key
      // their adjacency when broadcasts are disabled. Their loop-conf
      // behavior is evidenced by the committed plans/r15 dumps and the
      // timing canary; the per-round zero-exchange CONTRACT is asserted
      // on the unambiguous pageRank and Dedup.connectedComponents loops.)
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("kCore: multi-round peel strips a tail layer by layer, leaving " +
    "the triangle with exact in-core degrees") {
    // triangle {1,2,3} with a tail 3-4-5: round 1 peels 5 (deg 1),
    // round 2 peels 4 (deg fell to 1), round 3 removes nothing
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphAlgos.kCore(edges, k = 2)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: empty core, full core, and edge-noise collapse") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // k = 3 on a triangle: every node has degree 2 -> empty k-core
    assert(GraphAlgos.kCore(tri, k = 3).isEmpty)
    // K4 at k = 3: all four nodes survive at degree exactly 3
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("src", "dst")
    val got = GraphAlgos.kCore(k4, k = 3)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == (1L to 4L).map(_ -> 3L))
    // direction, parallel edges and self-loops collapse before peeling
    val noisy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 1L)).toDF("src", "dst")
    val clean = GraphAlgos.kCore(tri, k = 2).orderBy("node").collect().toSeq
    assert(GraphAlgos.kCore(noisy, k = 2).orderBy("node").collect().toSeq
      == clean)
  }

  test("labelPropagation: two dense cliques joined by one bridge edge " +
    "settle into two communities; components would merge them") {
    // K4 {1..4} + K4 {11..14} + bridge 4-11: within-clique degree (3)
    // outvotes the single cross edge, so the cliques keep distinct
    // labels — the behavior that distinguishes LPA from components
    def k4(off: Long) = for {
      a <- 1 to 4; b <- (a + 1) to 4
    } yield (off + a, off + b)
    val edges = (k4(0) ++ k4(10) :+ (4L, 11L))
      .toDF("src", "dst")
    val got = GraphAlgos.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = (1L to 4L).map(got)
    val right = (11L to 14L).map(got)
    assert(left.distinct.size == 1 && right.distinct.size == 1)
    assert(left.head != right.head)
    // min-label components merge everything across the bridge
    val cc = graft.operators.Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"))
      .select("component").distinct().count()
    assert(cc == 1L)
    // deterministic: a re-run is row-identical
    val again = GraphAlgos.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
    // weight-1 everywhere ≡ the unweighted face, row-for-row
    val w1 = GraphAlgos.labelPropagation(
        edges.withColumn("w", lit(1L)), rounds = 4, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == got)
    // a heavy bridge outvotes clique-internal unit edges: with the
    // 4-11 edge at weight 10, node 4 hears {1,2,3}@1 each vs 11's
    // label @10 — the right clique's label invades across the bridge
    val heavy = GraphAlgos.labelPropagation(
        edges.withColumn("w",
          when(col("src") === 4L && col("dst") === 11L, 10L).otherwise(1L)),
        rounds = 4, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(heavy(4L) != got(4L),
      s"weighted bridge should flip node 4: ${heavy(4L)} vs ${got(4L)}")
  }

  test("kCore: a deep fringe past maxRounds fails fast by default") {
    // a path peels one layer per round from each end: 8 nodes need 4
    // rounds at k = 2 before the (empty) core is reached
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphAlgos.kCore(path, k = 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    assert(GraphAlgos.kCore(path, k = 2, maxRounds = 8).isEmpty)
  }

  test("linkPrediction: C4 closed form — both diagonals score cn=2, " +
    "jaccard=1, ra=1; existing edges never appear") {
    // cycle 1-2-3-4-1: distance-2 pairs are the diagonals (1,3) and
    // (2,4), each with BOTH off-diagonal nodes as common neighbors;
    // all degrees are 2, so jaccard = 2/(2+2-2) = 1, ra = 1/2 + 1/2
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = GraphAlgos.linkPrediction(c4, exactFolds = true)
      .orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq((1L, 3L, 2L, 1.0, 1.0), (2L, 4L, 2L, 1.0, 1.0)))
    // direction and parallel edges collapse: reversed + duplicated
    // edge list scores identically
    val noisy = c4.union(c4.select(col("dst").as("src"),
      col("src").as("dst"))).union(c4)
    val again = GraphAlgos.linkPrediction(noisy, exactFolds = true)
      .orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(again == got)
  }

  test("linkPrediction: excludeExisting=false scores adjacent pairs " +
    "too; minCommon prunes the single-wedge tail") {
    // triangle 1-2-3 plus pendant 3-4: adjacent pair (1,2) shares z=3
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val all = GraphAlgos.linkPrediction(g, excludeExisting = false,
        exactFolds = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2) via 3, (1,3) via 2, (2,3) via 1, (1,4)/(2,4) via 3
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    val strict = GraphAlgos.linkPrediction(g, minCommon = 2,
        excludeExisting = false, exactFolds = true).collect()
    assert(strict.isEmpty, "no pair has 2 common neighbors here")
  }

  test("linkPrediction: maxMidDegree drops hub-mediated wedges — the " +
    "celebrity-middle guard") {
    // star: hub 9 connects 1..5; every candidate pair exists only
    // through the hub (degree 5)
    val star = (1L to 5L).map(i => (i, 9L)).toDF("src", "dst")
    assert(GraphAlgos.linkPrediction(star).count() == 10L) // C(5,2)
    assert(GraphAlgos.linkPrediction(star,
      maxMidDegree = Some(4)).isEmpty)
    // production default (map-side sum) matches the exact fold ≤1e-12
    val fast = GraphAlgos.linkPrediction(star).orderBy("u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    val exact = GraphAlgos.linkPrediction(star, exactFolds = true)
      .orderBy("u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(fast.map(t => (t._1, t._2, t._3, t._4)) ==
      exact.map(t => (t._1, t._2, t._3, t._4)))
    assert(fast.zip(exact).forall { case (f, e) =>
      math.abs(f._5 - e._5) <= 1e-12 * math.max(1.0, math.abs(e._5)) })
  }

  test("weightedShortestPaths: a light 2-hop path beats a heavy direct " +
    "edge; parallel edges combine by min; weight-1 ≡ unweighted BFS") {
    // 1→2 costs 10 direct, but 1→3→2 costs 1+2 = 3
    val g = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L))
      .toDF("src", "dst", "w")
    val lm = Seq(1L).toDF("node")
    val got = GraphAlgos.weightedShortestPaths(g, lm)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
    // a cheaper parallel duplicate of the heavy edge wins
    val par = GraphAlgos.weightedShortestPaths(
        g.union(Seq((1L, 2L, 2L)).toDF("src", "dst", "w")), lm)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(par(2L) == 2L)
    // weight 1 everywhere reproduces the unweighted BFS distances
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val bfs = GraphAlgos.shortestPaths(chain, lm).orderBy("node", "landmark")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSeq
    val w1 = GraphAlgos.weightedShortestPaths(
        chain.withColumn("w", lit(1L)), lm).orderBy("node", "landmark")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(w1 == bfs)
  }

  test("weightedShortestPaths: fails fast when maxRounds is too small " +
    "for the shortest-path hop depth") {
    val path = (1L to 6L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val lm = Seq(1L).toDF("node")
    val e = intercept[IllegalArgumentException] {
      GraphAlgos.weightedShortestPaths(path, lm, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    val full = GraphAlgos.weightedShortestPaths(path, lm, maxRounds = 8)
      .orderBy("node").collect().map(r => r.getLong(2)).toSeq
    assert(full == (0L to 6L))
  }

  test("linkPrediction / bipartiteProject plans stay equi-join shaped: " +
    "no cartesian or nested-loop join; the production fold keeps " +
    "codegen (no collect_list), the exact face carries it by design") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val fastPlan = GraphAlgos.linkPrediction(g)
      .queryExecution.executedPlan.toString
    assert(!fastPlan.contains("CartesianProduct") &&
      !fastPlan.contains("BroadcastNestedLoopJoin"), fastPlan)
    assert(!fastPlan.contains("collect_list"),
      s"production ra fold must be a plain sum:\n$fastPlan")
    val exactPlan = GraphAlgos.linkPrediction(g, exactFolds = true)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("collect_list"),
      "the exact face is the sorted fold — faces must differ")
    val bip = Seq((1L, "a"), (2L, "a"), (1L, "b")).toDF("l", "r")
    val bpPlan = GraphAlgos.bipartiteProject(bip)
      .queryExecution.executedPlan.toString
    assert(!bpPlan.contains("CartesianProduct") &&
      !bpPlan.contains("BroadcastNestedLoopJoin"), bpPlan)
    assert(bpPlan.contains("partial_count"),
      s"pair weights must map-side combine:\n$bpPlan")
  }

  test("kTruss: K4 survives at k=4 with support 2; a pendant triangle " +
    "and loose edge peel away; shared-edge triangles cascade to empty") {
    // K4 on 1..4 (every edge in 2 triangles) + triangle {4,5,6} (support
    // 1 edges) + pendant 6-7 (no triangle)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val g = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)))
      .toDF("src", "dst")
    val got = GraphAlgos.kTruss(g, k = 4).orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == k4.map { case (a, b) => (a, b, 2L) })
    assert(GraphAlgos.kTruss(g, k = 5).isEmpty)
    // two triangles sharing edge (2,3): k=4 drops the support-1 outer
    // edges, which cascades the shared edge to support 0 — empty truss
    val twoTri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    assert(GraphAlgos.kTruss(twoTri, k = 4).isEmpty)
    // ...and the cascade needs 2 rounds: maxRounds=1 fails fast
    val e = intercept[IllegalArgumentException] {
      GraphAlgos.kTruss(twoTri, k = 4, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // k=2 is the whole graph (support ≥ 0), with per-edge supports
    val all = GraphAlgos.kTruss(twoTri, k = 2).orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
  }

  test("kTrussDecremental matches the recount face cell-for-cell") {
    // the q137 fixture shape plus random mod graphs with cascades
    val rng = new scala.util.Random(41)
    val rand = (0 until 3).map { _ =>
      (0 until 260).map { _ =>
        (rng.nextInt(40).toLong, rng.nextInt(40).toLong) }
        .toDF("src", "dst")
    }
    val cascade = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    for (g <- rand :+ cascade; k <- Seq(3, 4, 8)) {
      val a = GraphAlgos.kTruss(g, k).orderBy("u", "v").collect().toSeq
      val b = GraphAlgos.kTrussDecremental(g, k).orderBy("u", "v")
        .collect().toSeq
      assert(a === b, s"recount vs decremental diverged at k=$k")
    }
    // k=2 has no peeling to incrementalize: rejected loudly
    intercept[IllegalArgumentException] {
      GraphAlgos.kTrussDecremental(cascade, k = 2)
    }
    // maxRounds too small still fails fast
    intercept[IllegalArgumentException] {
      GraphAlgos.kTrussDecremental(cascade, k = 4, maxRounds = 1)
    }
  }

  test("richClub: a hub clique with pendant spokes concentrates at " +
    "high k") {
    // K4 on 1..4 (deg 3+spokes) + one pendant per hub (deg 1)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val spokes = Seq((1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))
    val got = GraphAlgos.richClub((k4 ++ spokes).toDF("src", "dst"),
      ks = Seq(1, 3)).orderBy("k").collect()
    // k=1: hubs have deg 4, pendants deg 1 → n=4, e=6, phi=1.0
    assert(got(0).getLong(1) === 4L && got(0).getLong(2) === 6L &&
      got(0).getDouble(3) === 1.0)
    // k=3: still the 4 hubs (deg 4 > 3) → same club
    assert(got(1).getLong(1) === 4L && got(1).getDouble(3) === 1.0)
    // k beyond max degree: empty club, null phi
    val empty = GraphAlgos.richClub(k4.toDF("src", "dst"), ks = Seq(9))
      .collect().head
    assert(empty.getLong(1) === 0L && empty.isNullAt(3))
  }

  test("betweenness: diamond closed form — the two middle nodes split " +
    "the dependency; sources/sinks score zero") {
    // 1→2→4, 1→3→4: two shortest 1→4 paths, one through each middle
    val g = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L, 4L).toDF("node")
    val got = GraphAlgos.betweenness(g, all, exactFolds = true)
      .orderBy("node").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 0.5, 4L -> 0.0))
  }

  test("betweenness: matches a driver-side Brandes reference on a " +
    "pseudo-random graph; fast folds track the exact face") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(e => e._1 != e._2).distinct
    val maxHops = 5
    // driver-side truncated Brandes: BFS + σ DP + δ DP per source
    val adj = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).sorted }.withDefaultValue(Seq.empty[Long])
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val bcRef = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    for (s <- nodes) {
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
        .withDefaultValue(0L)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty && d < maxHops) {
        d += 1
        val next = scala.collection.mutable.LinkedHashSet.empty[Long]
        for (u <- frontier; v <- adj(u)) {
          if (!dist.contains(v)) next += v
        }
        for (v <- next) dist(v) = d
        for (u <- frontier; v <- adj(u); if dist(v) == d)
          sigma(v) += sigma(u)
        frontier = next.toSeq
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      for (lvl <- (d - 1) to 0 by -1;
           v <- dist.filter(_._2 == lvl).keys.toSeq.sorted) {
        var acc = 0.0
        for (w <- adj(v); if dist.get(w).contains(lvl + 1))
          acc += (sigma(v).toDouble / sigma(w).toDouble) * (1.0 + delta(w))
        if (adj(v).exists(w => dist.get(w).contains(lvl + 1)))
          delta(v) = acc
        if (v != s) bcRef(v) += delta(v)
      }
    }
    val df = edges.toDF("src", "dst")
    val srcs = nodes.toDF("node")
    val exact = GraphAlgos.betweenness(df, srcs, maxHops,
        exactFolds = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(exact(v) - bcRef(v)) <=
        1e-9 * math.max(1.0, bcRef(v)), s"node $v: ${exact(v)} vs ${bcRef(v)}")
    }
    val fast = GraphAlgos.betweenness(df, srcs, maxHops)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    nodes.foreach { v =>
      assert(math.abs(fast(v) - exact(v)) <=
        1e-12 * math.max(1.0, math.abs(exact(v))))
    }
  }

  test("bipartiteProject: shared-right co-occurrence weights, support " +
    "floor, and the celebrity-right degree cap") {
    // left {1,2,3} × right {a,b}: 1-a 2-a 1-b 2-b 3-b (+ a duplicate)
    val bip = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b"), (3L, "b"),
      (1L, "a")).toDF("l", "r")
    val got = GraphAlgos.bipartiteProject(bip).orderBy("l1", "l2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val floored = GraphAlgos.bipartiteProject(bip, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(floored == Seq((1L, 2L, 2L)))
    // cap 2 drops right node b (degree 3): only the a-wedge survives
    val capped = GraphAlgos.bipartiteProject(bip, maxRightDegree = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped == Seq((1L, 2L, 1L)))
  }

  test("harmonicCentrality: directed-chain closed form at the 60× " +
    "integer scale; unreached nodes absent") {
    // 1 -> 2 -> 3 -> 4, all nodes as landmarks: h_scaled(v) = Σ 60/d
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val lm = Seq(1L, 2L, 3L, 4L).toDF("node")
    val got = GraphAlgos.harmonicCentrality(chain, lm, maxHops = 6)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // node 2: d=1 from 1 → 60; node 3: d=2,1 → 30+60; node 4: 20+30+60
    assert(got == Seq((2L, 1L, 60L), (3L, 2L, 90L), (4L, 3L, 110L)))
    assert(GraphAlgos.harmonicScale(6) == 60L)
    assert(GraphAlgos.harmonicScale(1) == 1L)
    // maxHops truncation: cap 1 sees only direct predecessors
    val capped = GraphAlgos.harmonicCentrality(chain, lm, maxHops = 1)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped == Seq((2L, 1L, 1L), (3L, 1L, 1L), (4L, 1L, 1L)))
  }

  // ===== strongly connected components =====

  test("scc: cycles collapse, bridges and DAG tails stay singleton") {
    // {1,2,3} cycle -> 4 -> {5,6} cycle; 7 -> 8 DAG tail
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 5L), (7L, 8L)).toDF("src", "dst")
    val got = GraphAlgos.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("scc: a pure DAG is all singletons (trim path)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val got = GraphAlgos.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("scc: chained cycles force multiple outer rounds and keep " +
    "components distinct") {
    // ring A {1,2,3} -> ring B {11,12,13} -> ring C {21,22,23}
    def ring(ids: Seq[Long]) = ids.zip(ids.tail :+ ids.head)
    val edges = (ring(Seq(1L, 2L, 3L)) ++ ring(Seq(11L, 12L, 13L)) ++
      ring(Seq(21L, 22L, 23L)) ++ Seq((3L, 11L), (13L, 21L)))
      .toDF("src", "dst")
    val got = GraphAlgos.stronglyConnectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.collect { case (k, v) if k < 10L => v }.toSet == Set(1L))
    assert(got.collect { case (k, v) if k > 10L && k < 20L => v }
      .toSet == Set(11L))
    assert(got.collect { case (k, v) if k > 20L => v }.toSet == Set(21L))
  }

  test("scc: matches the brute-force mutual-reachability labels on a " +
    "seeded random graph, bit-identically across runs") {
    val rnd = new scala.util.Random(42)
    val n = 24
    val edges0 = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    // brute force: boolean closure, scc(v) = min mutual-reach partner
    val reach = Array.fill(n, n)(false)
    edges0.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    (0 until n).foreach(i => reach(i)(i) = true)
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val present = edges0.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val want = present.map { v =>
      v -> present.filter(w => reach(v.toInt)(w.toInt) &&
        reach(w.toInt)(v.toInt)).min
    }.toMap
    val df = edges0.toDF("src", "dst")
    val a = GraphAlgos.stronglyConnectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphAlgos.stronglyConnectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == want)
    assert(a == b)
  }

  test("scc: self-loops drop and a self-loop-only graph returns empty") {
    val edges = Seq((1L, 1L)).toDF("src", "dst")
    assert(GraphAlgos.stronglyConnectedComponents(edges).count() == 0L)
  }

  // ===== graph-level metrics =====

  test("reciprocity: counts mutual pairs once per direction") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 2L), (1L, 3L))
      .toDF("src", "dst")
    val r = GraphAlgos.reciprocity(edges).collect().head
    assert(r.getLong(0) == 4L) // distinct non-loop edges
    assert(r.getLong(1) == 2L) // (1,2) and (2,1)
    assert(r.getDouble(2) == 2.0 / 4.0)
  }

  test("degreeAssortativity: a path graph is perfectly disassortative") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphAlgos.degreeAssortativity(edges).collect().head
    assert(r.getLong(0) == 4L) // both orientations of two edges
    assert(r.getLong(1) == 8L) // sxy = 1*2 + 2*1 + 2*1 + 1*2
    assert(r.getDouble(2) == -1.0)
  }

  test("degreeAssortativity: degree-matched components correlate to +1 " +
    "(up to the sqrt(x)*sqrt(x) ulp)") {
    // an edge (deg 1-1) plus a triangle (deg 2-2): every sample has
    // x == y, so the correlation is +1 within one double ulp
    val edges = Seq((1L, 2L), (11L, 12L), (12L, 13L), (13L, 11L))
      .toDF("src", "dst")
    val r = GraphAlgos.degreeAssortativity(edges).collect().head
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("kShell: onion layers on a K4 with a triangle lobe and a tail") {
    // K4 {1,2,3,4} (shell 3) - 4-5-6 triangle edge? build: K4, triangle
    // {4,5,6} sharing node 4, tail 6-7-8
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L),
      (7L, 8L))).toDF("src", "dst")
    val got = GraphAlgos.kShell(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 2L, 6L -> 2L, 7L -> 1L, 8L -> 1L))
  }

  test("kShell: matches brute-force core numbers on a seeded random " +
    "graph, bit-identically across runs") {
    val rnd = new scala.util.Random(5)
    val edges0 = Seq.fill(80)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // brute force: incremental peel
    val adj = scala.collection.mutable.Map.empty[Long,
      scala.collection.mutable.Set[Long]]
    edges0.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val want = scala.collection.mutable.Map.empty[Long, Long]
    var k = 1L
    while (adj.nonEmpty && k <= 30) {
      var go = true
      while (go) {
        val drop = adj.filter(_._2.size < k).keys.toSeq
        if (drop.isEmpty) go = false
        else drop.foreach { n =>
          want(n) = k - 1
          adj(n).foreach(m => adj.get(m).foreach(_ -= n))
          adj -= n
        }
      }
      k += 1
    }
    val df = edges0.toDF("src", "dst")
    val a = GraphAlgos.kShell(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = GraphAlgos.kShell(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == want.toMap)
    assert(a == b)
  }

  test("modularity: exact integer numerator on two bridged triangles") {
    // triangles {1,2,3} and {4,5,6} bridged by (3,4): m = 7,
    // intra = 6, d_A = d_B = 7 -> q_num = 4*7*6 - 98 = 70, Q = 70/196
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "label")
    val r = GraphAlgos.modularity(edges, labels).collect().head
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 70L)
    assert(r.getDouble(2) == 70.0 / 196.0)
  }

  test("modularity: composes with labelPropagation and scores the " +
    "planted partition above the random one") {
    def ring(ids: Seq[Long]) = ids.zip(ids.tail :+ ids.head)
    val a = Seq(1L, 2L, 3L, 4L)
    val b = Seq(11L, 12L, 13L, 14L)
    // two K4-ish rings with chords, one bridge
    val edges = (ring(a) ++ ring(b) ++ Seq((1L, 3L), (11L, 13L),
      (4L, 11L))).toDF("src", "dst")
    val lpa = GraphAlgos.labelPropagation(edges, rounds = 4)
    val good = GraphAlgos.modularity(edges, lpa,
      nodeCol = "node", labelCol = "label")
      .collect().head.getDouble(2)
    val bad = GraphAlgos.modularity(edges,
      (a ++ b).toDF("node").withColumn("label", col("node") % 2))
      .collect().head.getDouble(2)
    assert(good > bad, s"LPA partition $good must beat parity $bad")
  }

  // ===== deterministic walks =====

  test("hashGreedyWalks: every hop follows an edge, runs are " +
    "bit-identical, and both hash faces produce valid walks") {
    val epairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L),
      (3L, 4L), (4L, 1L))
    val edges = epairs.toDF("src", "dst")
    val eset = epairs.toSet
    val starts = Seq(1L, 4L).toDF("node")
    for (md5Face <- Seq(true, false)) {
      val rows = GraphAlgos.hashGreedyWalks(edges, starts, steps = 6,
          md5Hash = md5Face)
        .orderBy("walk", "step")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val byWalk = rows.groupBy(_._1)
      assert(byWalk.keySet == Set(1L, 4L))
      byWalk.values.foreach { path =>
        val sorted = path.sortBy(_._2)
        assert(sorted.head._2 == 0 && sorted.head._3 == sorted.head._1)
        assert(sorted.map(_._2).toSeq == (0 to 6))
        sorted.sliding(2).foreach { case Array(p, q) =>
          assert(eset.contains((p._3, q._3)),
            s"hop ${p._3} -> ${q._3} is not an edge")
        }
      }
      val again = GraphAlgos.hashGreedyWalks(edges, starts, steps = 6,
          md5Hash = md5Face)
        .orderBy("walk", "step")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      assert(rows.toSeq == again.toSeq)
    }
  }

  test("hashGreedyWalks: dead ends terminate the walk early") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val starts = Seq(1L, 3L).toDF("node")
    val rows = GraphAlgos.hashGreedyWalks(edges, starts, steps = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // walk 1: 1 -> 2 -> 3 then stops; walk 3: no out-edges at all
    assert(rows.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(0, 1, 2))
    assert(rows.filter(_._1 == 3L).map(_._2).toSeq == Seq(0))
  }

  test("degreeDistribution: power-of-two bins without float log") {
    // star center degree 4 → bin 2; leaves degree 1 → bin 0
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("src", "dst")
    val got = GraphAlgos.degreeDistribution(star).orderBy("bin")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0, 4L, 1L), (2, 1L, 4L)))
  }

  private def msfSet(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("u", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("minSpanningForest drops exactly the heaviest edge of a cycle") {
    val tri = Seq((1L, 2L, 10L), (2L, 3L, 20L), (1L, 3L, 30L))
      .toDF("src", "dst", "w")
    assert(msfSet(GraphAlgos.minSpanningForest(tri)) ===
      Seq((1L, 2L, 10L), (2L, 3L, 20L)))
  }

  test("minSpanningForest survives a monotone path (deep pointer chains)") {
    // path 0-1-...-9, increasing weights: every comp points downhill,
    // the pointer graph is one long chain — the jump loop's worst case
    val path = (0L to 8L).map(i => (i, i + 1, 100L + i)).toDF("src", "dst", "w")
    assert(msfSet(GraphAlgos.minSpanningForest(path)) ===
      (0L to 8L).map(i => (i, i + 1, 100L + i)))
  }

  test("minSpanningForest: parallel edges collapse to the min weight") {
    val par = Seq((1L, 2L, 5L), (2L, 1L, 3L)).toDF("src", "dst", "w")
    assert(msfSet(GraphAlgos.minSpanningForest(par)) === Seq((1L, 2L, 3L)))
  }

  test("minSpanningForest handles a disconnected forest and ties") {
    // component A: equal-weight triangle — the (w,u,v) total order
    // keeps (1,2) and (1,3); component B: a lone edge
    val g = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L),
      (10L, 11L, 7L)).toDF("src", "dst", "w")
    assert(msfSet(GraphAlgos.minSpanningForest(g)) ===
      Seq((1L, 2L, 5L), (1L, 3L, 5L), (10L, 11L, 7L)))
  }

  test("densestSubgraph crowns a planted K4 over a tail (eps = 0)") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val got = GraphAlgos.densestSubgraph((k4 ++ tail).toDF("src", "dst"),
      epsNum = 0, epsDen = 1)
    val rows = got.orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    val head = got.select("best_round", "best_v", "best_e", "density")
      .distinct().collect().head
    assert((head.getInt(0), head.getLong(1), head.getLong(2),
      head.getDouble(3)) === ((1, 4L, 6L, 1.5)))
  }

  test("densestSubgraph: a regular graph peels in one round, best = 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val got = GraphAlgos.densestSubgraph(tri, epsNum = 0, epsDen = 1)
    assert(got.count() === 3L)
    val head = got.select("best_round", "density").distinct().collect().head
    assert((head.getInt(0), head.getDouble(1)) === ((0, 1.0)))
  }

  test("markovStationary: the uniform distribution is the 2-cycle fixpoint") {
    val chain = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val got = GraphAlgos.markovStationary(chain, iterations = 3,
        exactFolds = true)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(got === Seq(("a", 0.5), ("b", 0.5)))
  }

  test("markovStationary: dangling states hold mass (absorbing end)") {
    val g = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val got = GraphAlgos.markovStationary(g, iterations = 4,
        exactFolds = true)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(got === Seq(("a", 0.0), ("b", 1.0)))
  }

  test("bowtie classifies in/scc/out/other against the largest SCC") {
    // 1<->2 core; 3 -> core -> 4; disconnected 5 -> 6
    val g = Seq((1L, 2L), (2L, 1L), (3L, 1L), (2L, 4L), (5L, 6L))
      .toDF("src", "dst")
    val got = GraphAlgos.bowtie(g)
      .orderBy("bowtie_class").as[(String, Long)].collect().toSeq
    assert(got === Seq(("in", 1L), ("other", 2L), ("out", 1L),
      ("scc", 2L)))
  }

  test("effectiveDiameter rank-selects the pct distance exactly") {
    // chain of 11 nodes from landmark 0: dists 1..10 -> p90 lower = 9
    val g = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val lm = Seq(0L).toDF("node")
    val got = GraphAlgos.effectiveDiameter(g, lm, maxHops = 12, pct = 90)
      .as[(Long, Int, Double)].collect().head
    assert(got === ((10L, 9, 5.5)))
  }

  test("closenessCentrality: one division over landmark distances") {
    val g = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val lm = Seq("a").toDF("node")
    val got = GraphAlgos.closenessCentrality(g, lm, maxHops = 6)
      .orderBy("node").as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("b", 1L, 1L, 1.0), ("c", 1L, 2L, 0.5)))
  }

  test("katzCentrality: exact dyadic numerators on a 3-chain") {
    // a->b->c, alpha=1/2, 2 rounds: N1 = 2 everywhere;
    // N2(a)=4, N2(b)=N1(a)+4=6, N2(c)=N1(b)+4=6; katz = N2/4
    val g = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val got = GraphAlgos.katzCentrality(g, iterations = 2,
        alphaInvLog2 = 1)
      .orderBy("node").as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 4L, 1.0), ("b", 6L, 1.5), ("c", 6L, 1.5)))
  }

  test("maximalMatching equals sequential greedy by (w,u,v)") {
    // path 1-2-3-4: (2,3,w=1) wins and blocks both neighbors;
    // the disjoint (5,6) edge still matches
    val g = Seq((1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 4L), (5L, 6L, 2L))
      .toDF("src", "dst", "w")
    val got = GraphAlgos.maximalMatching(g)
      .orderBy("u", "v").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 3L, 1L), (5L, 6L, 2L)))
  }

  test("maximalMatching: a triangle matches exactly one edge") {
    val g = Seq((1L, 2L, 3L), (2L, 3L, 1L), (1L, 3L, 2L))
      .toDF("src", "dst", "w")
    val got = GraphAlgos.maximalMatching(g)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((2L, 3L, 1L)))
  }

  test("markovStationary conserves probability mass exactly-ish") {
    val g = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 2L), ("c", "b", 2L)).toDF("src", "dst", "w")
    val total = GraphAlgos.markovStationary(g, iterations = 5,
        exactFolds = true)
      .agg(sum("p")).as[Double].collect().head
    assert(math.abs(total - 1.0) < 1e-12)
  }
}
