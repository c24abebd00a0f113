package graft

import org.apache.spark.sql.functions.{broadcast => _, _}
import graft.operators.Dedup

/** Dedup-operator behavior: exact survivors, MinHash estimates tracking
  * true Jaccard, SimHash finding near-identical docs, exact n-gram
  * Jaccard as ground truth. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // 80 distinct words: a repeated 9-word sentence would collapse to ~9
  // distinct shingles and make Jaccard/banding degenerate
  private val base = (1 to 80).map(i => s"word$i").mkString(" ")
  private def mutate(s: String, i: Int): String =
    s.split(" ").updated(i, "MUTANT" + i).mkString(" ")

  private val docs = Seq(
    (1L, base),                       // original
    (2L, base),                       // exact duplicate
    (3L, mutate(base, 5)),            // near-duplicate (1 word changed)
    (4L, mutate(mutate(base, 3), 40)),// near-duplicate (2 words changed)
    (5L, "completely different content about spark query engines and " +
      "distributed columnar execution at massive scale " * 6)
  ).toDF("doc_id", "text")

  test("codegen shingles are byte-identical to the HOF formulation") {
    // empty-token edge: leading/trailing/multiple whitespace makes split()
    // emit "" tokens which concat_ws keeps — both forms must agree on them
    val tricky = docs.union(Seq(
      (10L, "  leading and trailing  "), (11L, "a b"), (12L, ""),
      (13L, "ünïcode tökens répeat ünïcode tökens répeat ünïcode tökens")
    ).toDF("doc_id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val fast = Dedup.shingleRows(tricky, "doc_id", "text", n)
        .as[(Long, String)].collect().sorted.toSeq
      val hof = Dedup.shingleRowsHof(tricky, "doc_id", "text", n)
        .as[(Long, String)].collect().sorted.toSeq
      assert(fast == hof, s"n=$n")
    }
  }

  test("codegen shingles equal HOF on generated unicode corpora (property)") {
    import org.scalacheck.Gen
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("naïve", "café", "東京", "ü", ""), Gen.const(" "))
    val doc = Gen.listOf(word).map(_.mkString(" "))
    val samples = Iterator.continually(doc.sample).flatten.take(150).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = samples.toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val fast = Dedup.shingleRows(df, "doc_id", "text", n)
        .as[(Long, String)].collect().sorted.toSeq
      val hof = Dedup.shingleRowsHof(df, "doc_id", "text", n)
        .as[(Long, String)].collect().sorted.toSeq
      assert(fast == hof, s"n=$n")
    }
  }

  test("exact dedup keeps one survivor per identical text, min id wins") {
    val r = Dedup.exact(docs).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("dup_count"))).toMap
    assert(r(1L) == 2) // docs 1,2 collapse; survivor is id 1
    assert(r.values.sum == 5)
  }

  test("ngram Jaccard: near-duplicates score high, unrelated docs absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.3).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical
    assert(pairs((1L, 3L)) > 0.6) // one-word mutation
    assert(!pairs.keySet.exists { case (a, b) => b == 5L || a == 5L })
  }

  test("prefix-filtered jaccard join ≡ the naive all-shared-shingles " +
    "join at every threshold (PPJoin candidate rule loses no pair)") {
    // widen the corpus with threshold-boundary pairs: a half-overlap doc
    // and short docs where ⌈τ·n⌉ rounding decides the prefix length
    val corpus = docs.union(Seq(
      (6L, (1 to 40).map(i => s"word$i").mkString(" ")), // prefix of base
      (7L, "tiny doc alpha beta"),
      (8L, "tiny doc alpha gamma"),
      (9L, "tiny doc alpha beta")                         // exact dup of 7
    ).toDF("doc_id", "text"))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    for (tau <- Seq(0.1, 0.3, 0.5, 1.0)) {
      val naive = key(Dedup.ngramJaccardPairs(corpus, minJaccard = tau))
      val pref = key(Dedup.ngramJaccardPairsPrefix(corpus, minJaccard = tau))
      assert(pref == naive, s"divergence at tau=$tau")
    }
    // non-vacuous: the mid thresholds keep a strict subset
    assert(key(Dedup.ngramJaccardPairsPrefix(corpus, minJaccard = 0.1)).size >
      key(Dedup.ngramJaccardPairsPrefix(corpus, minJaccard = 1.0)).size)
    assert(key(Dedup.ngramJaccardPairsPrefix(corpus, minJaccard = 1.0))
      .keySet == Set((1L, 2L), (7L, 9L)))
  }

  test("minhash estimate tracks exact Jaccard within banding tolerance") {
    val exact = Dedup.ngramJaccardPairs(docs, minJaccard = 0.01).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("jaccard"))).toMap
    val est = Dedup.minHashLsh(docs, k = 64, bands = 16).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    // every strong near-dup (J >= 0.8) must surface: with r=4 rows/band and
    // 16 bands the miss probability at J=0.8 is (1-0.8^4)^16 < 0.01%
    exact.filter(_._2 >= 0.8).keys.foreach { k =>
      assert(est.contains(k), s"missing candidate pair $k")
      assert(math.abs(est(k) - exact(k)) < 0.35,
        s"estimate ${est(k)} vs exact ${exact(k)} for $k")
    }
    assert(exact.count(_._2 >= 0.8) >= 2, "test data should have strong pairs")
  }

  test("hot-bucket salted LSH is result-identical and engages on skew") {
    // a viral cluster: 40 near-copies of one doc land in the same buckets
    val viral = (100 to 139).map(i =>
      (i.toLong, mutate(base, i % 20))).toDF("doc_id", "text")
    val skewed = docs.union(viral)
    val plain = Dedup.minHashLsh(skewed, k = 16, bands = 4)
    val salted = Dedup.minHashLsh(skewed, k = 16, bands = 4,
      hotBucketThreshold = 8L, hotSalts = 4)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("est_jaccard"))).sorted.toSeq
    assert(key(salted) == key(plain))
    assert(key(plain).nonEmpty)
    // the salted path is actually in the plan (not silently all-cold) —
    // asserted on the un-checkpointed candidate plan (the public API's
    // eager localCheckpoint leaves only an ExistingRDD scan visible)
    val sigs = Dedup.minHashSignatures(skewed, "doc_id", "text", 3, 16)
    val plan = Dedup.minHashLshPlan(sigs, "doc_id", 16, 4,
        Dedup.xxBucketFamily, 8L, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salted branch missing from plan:\n$plan")
  }

  test("ngramJaccardPairs hot-shingle salting is result-identical") {
    // a boilerplate prefix shared by 40 docs makes its shingles viral
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val skewed = (1 to 40).map(i =>
        (i.toLong, s"$boiler " + (1 to 12).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).sorted.toSeq
    val plain = key(Dedup.ngramJaccardPairs(skewed, minJaccard = 0.1))
    val salted = key(Dedup.ngramJaccardPairs(skewed, minJaccard = 0.1,
      hotBucketThreshold = 8L, hotSalts = 4))
    assert(plain.nonEmpty)
    assert(salted == plain)
  }

  test("hot-bucket salting is result-identical across all three " +
       "self-join families on a deterministic high-collision corpus") {
    // a 12-word vocabulary over 15-word docs: shingles collide heavily,
    // so low thresholds make REAL hot buckets at every config. The
    // corpus is pseudo-random but DETERMINISTIC (an unseeded generator
    // would make the nonEmpty assertion below flake on unlucky draws)
    val corpus = (0 until 30).map { i =>
      (i.toLong,
        (0 until 15).map(j => s"w${(i * 31 + j * 7 + i * j) % 12}").mkString(" "))
    }.toDF("doc_id", "text")
    def pairsKey(df: org.apache.spark.sql.DataFrame, score: String) =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double](score))).sorted.toSeq
    for ((thr, salts) <- Seq((1L, 2), (2L, 4), (5L, 3))) {
      val jPlain = pairsKey(
        Dedup.ngramJaccardPairs(corpus, minJaccard = 0.05), "jaccard")
      val jSalt = pairsKey(Dedup.ngramJaccardPairs(corpus, minJaccard = 0.05,
        hotBucketThreshold = thr, hotSalts = salts), "jaccard")
      assert(jSalt == jPlain, s"jaccard thr=$thr salts=$salts")
      assert(jPlain.nonEmpty)
      val mPlain = pairsKey(
        Dedup.minHashLsh(corpus, k = 8, bands = 4), "est_jaccard")
      val mSalt = pairsKey(Dedup.minHashLsh(corpus, k = 8, bands = 4,
        hotBucketThreshold = thr, hotSalts = salts), "est_jaccard")
      assert(mSalt == mPlain, s"minhash thr=$thr salts=$salts")
      def hamKey(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
          r.getAs[Long]("hamming"))).sorted.toSeq
      val sPlain = hamKey(Dedup.simHashNearDups(corpus, maxHamming = 8))
      val sSalt = hamKey(Dedup.simHashNearDups(corpus, maxHamming = 8,
        hotBucketThreshold = thr, hotSalts = salts))
      assert(sSalt == sPlain, s"simhash thr=$thr salts=$salts")
    }
  }

  test("simhash: identical and near-identical docs within hamming 3") {
    val pairs = Dedup.simHashNearDups(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L))) // identical -> hamming 0
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
    // skew lever: hot-chunk salted join is result-identical here too
    val salted = Dedup.simHashNearDups(docs, maxHamming = 3,
      hotBucketThreshold = 1L, hotSalts = 4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(salted == pairs)
  }

  test("md5-bit simhash pipeline agrees with the packed-long pipeline's shape") {
    // identical docs -> hamming 0 pair; unrelated doc excluded at a tight cap
    val fp = Dedup.simHashBitsMd5(docs)
    val bits = fp.select("id", "bits").as[(Long, Seq[Int])].collect().toMap
    assert(bits.values.forall(_.size == 64))
    assert(bits(1L) == bits(2L)) // identical text -> identical fingerprint
    val pairs = Dedup.simHashNearDupsBits(fp, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("cc round join reuses the checkpointed edge partitioning") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import org.apache.spark.sql.functions.col
      val pairs = (1 to 50).map(i => (i.toLong, (i + 1).toLong))
        .toDF("id_a", "id_b")
      // capture the checkpoint with AQE off, as connectedComponents does —
      // an adaptive plan reports UnknownPartitioning at capture time
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edges =
        try pairs.select(col("id_a").as("u"), col("id_b").as("v"))
          .union(pairs.select(col("id_b"), col("id_a")))
          .repartition(col("v")).localCheckpoint(true)
        finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      val labels = edges.select(col("u").as("id")).distinct()
        .withColumn("label", col("id"))
      val joined = edges.join(labels, edges("v") === labels("id"))
      val plan = joined.queryExecution.executedPlan.toString
      // exactly ONE exchange: the labels aggregation; the checkpointed
      // edges carry hashpartitioning(v) into the join, so the 2|E| side
      // is never re-shuffled per round
      val n = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(n == 1, s"expected only the label-side exchange, got $n:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("connectedComponents PRODUCTION rounds never re-shuffle the 2|E| " +
       "side, even when the session conf disagrees with the size-derived " +
       "count (r14 verdict item 2)") {
    // The r14 spec asserted an INLINE replica of the round join; this one
    // captures the executed plan of every action the real operator runs.
    // Session conf = 4 while adaptiveParts derives 1 for this tiny frame —
    // exactly the mismatch regime where EnsureRequirements would re-shuffle
    // the smaller-count (edge) child to the checkpointed label side's
    // count each round, were the loop not pinned to the edge count.
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
    spark.listenerManager.register(listener)
    try {
      val rnd = new scala.util.Random(17)
      val pairs = (1 to 200).map(_ =>
        (rnd.nextInt(50).toLong + 1L, rnd.nextInt(50).toLong + 1L))
        .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
      Dedup.connectedComponents(pairs).count()
      // listener delivery is async; wait for the queue to go quiet
      var last = -1
      while (plans.size() != last) { last = plans.size(); Thread.sleep(400) }
      assert(plans.size() >= 3, "expected at least prep + 2 round actions")
      import scala.jdk.CollectionConverters._
      val offenders = plans.asScala.zipWithIndex.flatMap { case (p, i) =>
        p.linesIterator.filter(l =>
          (l.contains("Exchange hashpartitioning(u#") ||
            l.contains("Exchange hashpartitioning(v#")) &&
            l.contains("ENSURE_REQUIREMENTS"))
          .map(l => s"action $i: ${l.trim.take(120)}")
      }
      assert(offenders.isEmpty,
        "a round re-shuffled the edge side:\n" + offenders.mkString("\n"))
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("connected components match a union-find over generated pair graphs") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 60).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = pairs.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = pairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    // same partition into components (min-id labels agree)
    ids.foreach { id => assert(got(id) == find(id), s"id $id") }

    // cluster dedup keeps exactly one survivor per component + untouched docs
    val docs = (0L until 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val kept = Dedup.dedupByComponents(docs, df).select("doc_id")
      .as[Long].collect().toSet
    val losers = ids.filter(id => find(id) != id).toSet
    assert(kept == (0L until 50L).toSet -- losers)
  }

  test("componentBest keeps the highest-scored member per cluster, " +
    "ties to the lowest id; dedupByComponentsBest anti-joins the rest") {
    // cluster {1,2,3}: scores 5,9,9 -> survivor 2 (tie 2 vs 3 -> min id)
    // cluster {10,11}: scores 4,7 -> survivor 11
    // doc 20: singleton, no cluster row, always survives the dedup
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 7L),
      (20L, 1L)).toDF("doc_id", "score")
    val best = Dedup.componentBest(docs, pairs, "score")
      .orderBy("component")
      .as[(Long, Long, Long)].collect().toSeq
    assert(best == Seq((1L, 2L, 3L), (10L, 11L, 2L)))
    val kept = Dedup.dedupByComponentsBest(docs, pairs, "score")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 11L, 20L))
    // min-id rule keeps a different (worse-scored) survivor by design
    val minId = Dedup.dedupByComponents(docs, pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 10L, 20L))
  }

  test("star contraction matches label propagation on random pair graphs") {
    for (seed <- Seq(3, 17, 29)) {
      val rnd = new scala.util.Random(seed)
      val pairs = (1 to 70)
        .map(_ => (rnd.nextInt(45).toLong, rnd.nextInt(45).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
        .toDF("id_a", "id_b")
      val exact = Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponentsStar(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == exact, s"seed $seed")
    }
  }

  test("star contraction converges in O(log d) rounds on a deep chain") {
    // a 48-deep duplicate chain: label propagation needs one round per
    // unit of depth (maxIter = 10 must fail), star contraction halves
    // depth per round pair (maxIter = 10 must converge AND be correct)
    val chain = (0L until 48L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 10)
    }
    val star = Dedup.connectedComponentsStar(chain, maxIter = 10).collect()
    assert(star.length == 49 && star.forall(_.getLong(1) == 0L))
  }

  test("shingleRows emits distinct in-order n-grams") {
    val sh = Dedup.shingleRows(Seq((1L, "a b c d")).toDF("doc_id", "text"),
      "doc_id", "text", 3).select("shingle").as[String].collect().toSeq
    assert(sh == Seq("a b c", "b c d"))
    // shorter than n -> no shingles
    val none = Dedup.shingleRows(Seq((1L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", 3).count()
    assert(none == 0)
  }

  test("duplicatePassages finds shared spans; hash-keyed path is identical") {
    val span = "the quick brown fox jumps"
    val docs = Seq(
      (1L, s"intro words $span closing remarks"),
      (2L, s"other prefix $span different tail"),
      (3L, "nothing shared here at all five")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatePassages(docs, n = 5, minDocs = 2)
      .orderBy("shingle")
      .as[(String, Long, Long)].collect().toSeq
    // the shared span is exactly 5 words: its single window is the ONLY
    // repeated 5-gram in the corpus
    assert(got == Seq((span, 2L, 1L)))
    val hashed = Dedup.duplicatePassages(docs, n = 5, minDocs = 2, hashKey = true)
    assert(hashed.except(Dedup.duplicatePassages(docs, n = 5, minDocs = 2)).isEmpty &&
      Dedup.duplicatePassages(docs, n = 5, minDocs = 2).except(hashed).isEmpty)
  }

  test("incremental LSH against a persisted index matches the batch operator") {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog tonight",
      "a completely different document about spark physical plans",
      "numbers one two three four five six seven eight nine ten")
    val corpus = base.zipWithIndex.flatMap { case (t, i) =>
      Seq((i * 10L, t), (i * 10L + 1L, t + " tail"))
    }.toDF("doc_id", "text")
    val batch = Seq(
      (100L, base(0) + " extra"),           // near-dup of cluster 0
      (101L, "nothing like anything here at all zz yy xx")
    ).toDF("doc_id", "text")
    Dedup.writeLshIndex(corpus, n = 3, k = 8, bands = 4, table = "lsh_idx_spec")
    try {
      val viaIndex = Dedup.lshAgainstIndex(batch, "lsh_idx_spec",
          n = 3, k = 8, bands = 4)
        .select("id_new", "id_idx", "est_jaccard")
      // witness: the batch operator over the union, restricted to
      // cross-set pairs and re-oriented (new, idx)
      val union = corpus.unionByName(batch)
      val all = Dedup.minHashLsh(union, n = 3, k = 8, bands = 4)
      val want = all
        .filter((col("id_a") >= 100L) =!= (col("id_b") >= 100L))
        .select(
          when(col("id_a") >= 100L, col("id_a")).otherwise(col("id_b")).as("id_new"),
          when(col("id_a") >= 100L, col("id_b")).otherwise(col("id_a")).as("id_idx"),
          col("est_jaccard"))
      assert(viaIndex.except(want).isEmpty && want.except(viaIndex).isEmpty)
      assert(viaIndex.filter(col("id_new") === 100L).count() > 0,
        "the planted near-dup must surface")
      // broadcast-batch path: identical result
      val viaBroadcast = Dedup.lshAgainstIndex(batch, "lsh_idx_spec",
        n = 3, k = 8, bands = 4, broadcastNew = true)
      assert(viaBroadcast.except(viaIndex).isEmpty &&
        viaIndex.except(viaBroadcast).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_spec")
  }

  test("index-join plan never shuffles the index side") {
    val docs = (0L until 40L).map(i => (i, s"w$i x y z a b c")).toDF("doc_id", "text")
    Dedup.writeLshIndex(docs, n = 3, k = 8, bands = 4, table = "lsh_idx_plan")
    try {
      val sigs = Dedup.minHashSignatures(docs.limit(5), "doc_id", "text", 3, 8)
      val banded = Dedup.bandedOf(sigs, "doc_id", 8, 4, Dedup.xxBucketFamily)
      // merge path: ONE exchange (the new batch into the index bucketing)
      val merge = Dedup.lshIndexJoinPlan(spark.table("lsh_idx_plan"), banded,
        8, broadcastNew = false)
      val mPlan = merge.queryExecution.executedPlan.toString
      assert(mPlan.contains("SortMergeJoin"), mPlan)
      // the join needs both sides partitioned on (band, bucket): the
      // index side satisfies it from its bucketing (zero exchanges), so
      // exactly ONE (band, bucket) exchange exists — the new batch side.
      // (The batch's internal signature agg and the final dropDuplicates
      // exchange on other keys and don't count.)
      val mEx = mPlan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning(band"))
      assert(mEx == 1, s"expected 1 (band,bucket) exchange, got $mEx:\n$mPlan")
      assert(mPlan.contains("Bucketed: true"), "index scan must be bucket-local")
      // broadcast path: the join moves NOTHING through a shuffle
      val bc = Dedup.lshIndexJoinPlan(spark.table("lsh_idx_plan"), banded,
        8, broadcastNew = true)
      val bPlan = bc.queryExecution.executedPlan.toString
      assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_plan")
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs: hybrid q-gram + short-bucket join equals " +
    "the naive all-pairs result on strings straddling the threshold") {
    val rnd = new scala.util.Random(11)
    val strs = (1L to 60L).map { i =>
      i -> (1 to (4 + rnd.nextInt(11))).map(_ => "ab" (rnd.nextInt(2)))
        .mkString
    }
    val want = (for {
      (ia, sa) <- strs; (ib, sb) <- strs if ia < ib
      d = lev(sa, sb) if d <= 2
    } yield (ia, ib, d)).toSet
    val got = Dedup.editDistancePairs(strs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(want.nonEmpty, "vacuous fixture")
  }

  test("editDistancePairs: repeated q-grams cannot inflate the count " +
    "filter (multiset ordinals) and exact duplicates report dist 0") {
    val docs = Seq((1L, "aaaaaaaaaaaa"), (2L, "aaaaaaaaaabb"),
      (3L, "cccccccccccc"), (4L, "aaaaaaaaaaaa")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 2), (1L, 4L, 0), (2L, 4L, 2)))
  }

  test("containmentPairs finds directed near-subsets, not Jaccard") {
    // doc 2 is a 5-gram excerpt of doc 1 (containment 1.0 in that
    // direction; the reverse is far below 4/5); doc 3 is unrelated
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "c d e f g h i"),
      (3L, "x y z w v u t")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, n = 3, num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc2 has 5 3-grams, all inside doc1's 10
    assert(got === Set((2L, 1L, 5L)))
  }

  test("containmentPairs maxDf drops hot shingles before the join") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "c d e f g h i"),
      (3L, "x y z w v u t")).toDF("doc_id", "text")
    // every shared shingle has df = 2 — a cap of 1 kills the pair
    val got = Dedup.containmentPairs(docs, n = 3, num = 4, den = 5,
      maxDf = Some(1L)).collect()
    assert(got.isEmpty)
  }

  test("cosineTokenPairs weights repeated n-grams (Jaccard can't)") {
    // docs 1/2: same 3-gram multiset scaled — cosine 1.0; doc 3 shares
    // the set but with skewed multiplicities — cosine < 1
    val docs = Seq(
      (1L, "a b c a b c"),          // grams: abc,bca,cab,abc → counts 2,1,1
      (2L, "a b c a b c a b c"),    // counts 3,2,2 — not parallel: < 1
      (3L, "q r s t u v")).toDF("doc_id", "text")
    val got = Dedup.cosineTokenPairs(docs, n = 3, t2num = 9, t2den = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(got.length === 1)
    val (a, b, cos) = got.head
    assert((a, b) === ((1L, 2L)) && cos > 0.9 && cos < 1.0)
  }

  test("jaroWinkler kernel is bit-identical to the probed DuckDB values") {
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      org.apache.spark.sql.graft.TextOps.jaroWinkler(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // every constant below is DuckDB jaro_winkler_similarity output,
    // probed on this host (PLANS round 8) — compared with ===, i.e.
    // bit-for-bit
    assert(jw("MARTHA", "MARHTA") === 0.96111111111111114)
    assert(jw("DWAYNE", "DUANE") === 0.84000000000000008)
    assert(jw("DIXON", "DICKSONX") === 0.81333333333333324)
    assert(jw("red widget", "red widgte") === 0.97999999999999998)
    assert(jw("CRATE", "TRACE") === 0.73333333333333339) // boost gated: prefix 0
    assert(jw("abcdefgh", "badcfehg") === 0.83333333333333337)
    assert(jw("a", "ab") === 0.85000000000000009)
    assert(jw("aaaa", "aaaa") === 1.0)
    assert(jw("", "") === 0.0)       // DuckDB: empty is NOT a perfect match
    assert(jw("a", "") === 0.0)
    assert(jw("abc", "bca") === 0.0) // window 0: no same-position chars
    // integer transposition halving: 3 mismatched matches -> t=1, not 1.5
    assert(jw("abcdef", "bcadef") === 0.94444444444444453 +
      0.0 * 0.1) // jaro face: no common prefix, boost adds nothing
  }

  test("jaroWinklerPairs blocks by prefix+length and scores survivors") {
    val names = Seq((1L, "red widget"), (2L, "red widgte"), // transposed tail
      (3L, "red bolt"),                                     // same block, low sim
      (4L, "blue widget")                                   // different block
    ).toDF("id", "name")
    val got = Dedup.jaroWinklerPairs(names, "id", "name", minSim = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 0.97999999999999998)))
    // dropping the threshold surfaces the same-block low-sim pair too,
    // but NEVER the cross-block one (blocking is structural)
    val loose = Dedup.jaroWinklerPairs(names, "id", "name", minSim = 0.0,
        maxLenDiff = 10)
      .as[(Long, Long, Double)].collect().toSeq.map(p => (p._1, p._2))
    assert(loose.toSet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("canonicalUrl normalizes every gate variant to its closed form") {
    import spark.implicits._
    val urls = Seq(
      "https://example.com/p/5",
      "HTTPS://EXAMPLE.COM:443/p/5/",
      "https://example.com/p/5?utm_source=x&b=2&a=1",
      "https://example.com/p/5?a=1&b=2#frag",
      "http://Host:80/x?fbclid=1&z=9&a=2",
      "http://h:8080/x",
      "https://A.com/").toDF("url")
    val got = urls.select(Dedup.canonicalUrl(col("url")))
      .as[String].collect().toSeq
    assert(got === Seq(
      "https://example.com/p/5",
      "https://example.com/p/5",
      "https://example.com/p/5?a=1&b=2",
      "https://example.com/p/5?a=1&b=2",
      "http://host/x?a=2&z=9",
      "http://h:8080/x",
      "https://a.com"))
  }

  test("urlDedup: census with min-id survivor per canonical form") {
    import spark.implicits._
    val df = Seq((3L, "https://A.com/"), (1L, "https://a.com"),
      (2L, "https://b.com")).toDF("doc_id", "url")
    val got = Dedup.urlDedup(df, "url").orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("https://a.com", 2L, 1L), ("https://b.com", 1L, 2L)))
  }
}
