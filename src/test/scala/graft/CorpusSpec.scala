package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Corpus, TextAnalysis}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- decontamination

  test("contaminatedIds flags exactly the train docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains bench span
      (2L, "one two three four five six"),         // clean
      (3L, "x y alpha beta gamma delta w"),        // contains bench span mid-doc
      (4L, "alpha beta gamma")                     // too short for a 4-gram? no: 3 words < 4
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "prefix alpha beta gamma delta suffix")
    ).toDF("doc_id", "text")
    val bad = Corpus.contaminatedIds(train, bench, n = 4)
      .as[Long].collect().sorted
    assert(bad.toSeq == Seq(1L, 3L))
    val clean = Corpus.decontaminate(train, bench, n = 4)
      .select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(2L, 4L))
  }

  test("bloom-prefiltered decontamination is result-identical and plans " +
      "a codegen'd might_contain, no UDF") {
    val rnd = new scala.util.Random(7)
    val words = Vector("red", "blue", "green", "ash", "oak", "elm", "fox",
      "owl", "ant", "bee")
    def doc(): String = (1 to 12).map(_ => words(rnd.nextInt(words.size)))
      .mkString(" ")
    val train = (1L to 120L).map(i => (i, doc())).toDF("doc_id", "text")
    val bench = (200L to 210L).map(i => (i, doc())).toDF("doc_id", "text")
    val exact = Corpus.contaminatedIds(train, bench, n = 3)
      .as[Long].collect().sorted.toSeq
    val bloom = Corpus.contaminatedIdsBloom(train, bench, n = 3)
      .as[Long].collect().sorted.toSeq
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloom == exact)
    // the prefilter is the native bloom predicate on the train scan
    // (the lazy plan — the public operator checkpoints eagerly)
    val benchSh = graft.operators.Dedup
      .shingleRows(bench, "doc_id", "text", 3).select("shingle").distinct()
    val plan = Corpus
      .contaminatedIdsBloomPlan(train, benchSh, "doc_id", "text", 3, 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
  }

  test("decontamination is case-insensitive like the shingle pipeline") {
    val train = Seq((1L, "Alpha BETA gamma DELTA")).toDF("doc_id", "text")
    val bench = Seq((2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(Corpus.contaminatedIds(train, bench, n = 4).count() == 1)
  }

  test("fuzzyContaminatedIds catches a lightly-edited eval doc the exact " +
       "8-gram test misses, and leaves unrelated docs alone") {
    // 40 words, every 7th mutated: no 8-gram survives verbatim, but the
    // 3-gram Jaccard stays high
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val edited = base.split(" ").zipWithIndex
      .map { case (w, i) => if (i % 7 == 6) s"EDIT$i" else w }.mkString(" ")
    val train = Seq(
      (1L, edited),
      (2L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val bench = Seq((100L, base)).toDF("doc_id", "text")
    // the exact test misses the paraphrase...
    assert(Corpus.contaminatedIds(train, bench, n = 8).count() == 0)
    // ...the fuzzy test catches it, and only it
    // r=1 banding (bands=k): candidate on any agreeing member — the
    // high-recall configuration for decontamination, where a missed
    // leak costs more than extra verify work
    val bad = Corpus.fuzzyContaminatedIds(train, bench,
      k = 16, bands = 16, minEstJaccard = 0.2).as[Long].collect().toSeq
    assert(bad == Seq(1L))
    assert(Corpus.decontaminateFuzzy(train, bench, k = 16, bands = 16,
      minEstJaccard = 0.2).select("doc_id").as[Long].collect().toSeq == Seq(2L))
    // scale shape: the benchmark side broadcasts through the candidate
    // join — the train corpus never shuffles for it
    val plan = Corpus.fuzzyContaminatedIds(train, bench)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$plan")
  }

  // ---------------------------------------------------------------- packing

  test("packSequences matches the single-partition global-window witness") {
    val docs = (1L to 97L).map(i => (i, ("w " * (i % 13 + 1).toInt).trim))
      .toDF("doc_id", "text")
      .repartition(5) // force the multi-partition prefix-sum path
    val got = Corpus.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), budget = 20L)
      .select("doc_id", "n_tokens", "start_token", "seq_id", "crosses_boundary")

    // witness: one global window over the same md5 order (fine at test scale)
    val w = Window.orderBy("__key")
    val want = docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(concat_ws(":", lit("42"), col("doc_id").cast("string"))).as("__key"))
      .withColumn("start_token", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_id", expr("start_token div 20L"))
      .withColumn("crosses_boundary",
        col("n_tokens") > 0 &&
          expr("(start_token + n_tokens - 1) div 20L") > col("seq_id"))
      .select("doc_id", "n_tokens", "start_token", "seq_id", "crosses_boundary")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("packSequences layout is gapless and boundary flags are exact") {
    val docs = Seq((1L, 7L), (2L, 25L), (3L, 3L), (4L, 10L), (5L, 0L))
      .toDF("doc_id", "n")
    val rows = Corpus.packSequences(docs, "doc_id", col("n"), budget = 10L)
      .orderBy("start_token").collect()
    // offsets are a prefix sum: each start = previous start + previous len
    val starts = rows.map(_.getAs[Long]("start_token"))
    val lens = rows.map(_.getAs[Long]("n_tokens"))
    assert(starts.head == 0L)
    for (i <- 1 until rows.length)
      assert(starts(i) == starts(i - 1) + lens(i - 1))
    for (r <- rows) {
      val (s, n) = (r.getAs[Long]("start_token"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("seq_id") == s / 10L)
      val crosses = n > 0 && (s + n - 1) / 10L > s / 10L
      assert(r.getAs[Boolean]("crosses_boundary") == crosses)
    }
  }

  test("packSequences layout plan shuffles the narrow frame exactly once") {
    val docs = (1L to 50L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val keyed = docs
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        md5(concat_ws(":", lit("42"), col("doc_id").cast("string"))).as("__key"))
      .withColumn("__block", substring(col("__key"), 1, 2))
      .persist()
    try {
      val plan = Corpus.packLayout(keyed, "doc_id", 10L)
        .queryExecution.executedPlan.toString
      val shuffles = plan.split("\n")
        .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
      assert(shuffles == 1, s"expected 1 data shuffle, plan:\n$plan")
      assert(plan.contains("BroadcastExchange"),
        "block offsets must broadcast, not shuffle")
    } finally keyed.unpersist(false)
  }

  // ---------------------------------------------------------------- stratified sampling

  test("stratifiedSample keeps whole strata at/below target and is deterministic") {
    val docs = (1 to 400).map(i =>
      (i.toLong, s"doc number $i", if (i <= 300) "big" else "small"))
      .toDF("doc_id", "text", "lang")
    val a = Corpus.stratifiedSample(docs, Seq("lang"), col("text"), target = 120L)
    val b = Corpus.stratifiedSample(docs, Seq("lang"), col("text"), target = 120L)
    // deterministic: identical runs
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val byLang = a.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the under-target stratum survives whole
    assert(byLang("small") == 100L)
    // the over-target stratum is genuinely downsampled (rate 0.4): binomial
    // bounds are generous, the md5 rule is deterministic so this never flakes
    assert(byLang("big") < 300L && byLang("big") > 60L)
    // sampled rows are a subset of the input
    assert(a.join(docs, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("null strata survive sampling like any other stratum") {
    val docs = (1 to 60).map(i =>
      (i.toLong, s"text $i", if (i <= 50) "en" else null))
      .toDF("doc_id", "text", "lang")
    val kept = Corpus.stratifiedSample(docs, Seq("lang"), col("text"),
      target = 100L)
    // both strata are under target -> everything survives, nulls included
    assert(kept.count() == 60L)
    assert(kept.filter(col("lang").isNull).count() == 10L)
    val keptW = Corpus.stratifiedSampleByWeight(docs, Seq("lang"),
      col("text"), TextAnalysis.tokenCount(col("text")), budget = 10000L)
    assert(keptW.filter(col("lang").isNull).count() == 10L)
  }

  test("stratifiedSampleByWeight keeps whole strata under budget, downsamples over") {
    val docs = (1 to 200).map(i =>
      (i.toLong, s"tok " * 10 + i, if (i <= 150) "heavy" else "light"))
      .toDF("doc_id", "text", "source")
    // heavy: 150 docs * ~11 tokens = ~1650; light: 50 * ~11 = ~550
    val kept = Corpus.stratifiedSampleByWeight(docs, Seq("source"),
      col("text"), TextAnalysis.tokenCount(col("text")), budget = 600L)
    val bySource = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource("light") == 50L, "under-budget stratum survives whole")
    assert(bySource("heavy") < 150L && bySource("heavy") > 10L)
    // deterministic
    val again = Corpus.stratifiedSampleByWeight(docs, Seq("source"),
      col("text"), TextAnalysis.tokenCount(col("text")), budget = 600L)
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }

  // ---------------------------------------------------------------- chunking

  test("chunk emits strided overlapping windows with exact boundaries") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "xy")).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, size = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start", "chunk")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 1L, "abcd"), (1L, 1L, 4L, "defg"),
      (1L, 2L, 7L, "ghij"), (1L, 3L, 10L, "j"),
      (3L, 0L, 1L, "xy")))
    // adjacent chunks overlap by size - stride
    assert(got(0)._4.drop(3) == got(1)._4.take(1))
  }

  test("chunk with stride == size tiles without overlap or gaps") {
    val docs = Seq((1L, "a" * 10)).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, size = 4, stride = 4)
      .orderBy("chunk_id").select("chunk").as[String].collect()
    assert(got.toSeq == Seq("aaaa", "aaaa", "aa"))
    assert(got.map(_.length).sum == 10)
  }

  // ---------------------------------------------------------------- repetition

  test("repetitionStats scores repeated bigrams and degenerate docs") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // 4 windows, 1 distinct -> 0.75
      (2L, "all words here are unique"), // 4 windows, 4 distinct -> 0.0
      (3L, "solo"),                      // no window -> 0.0
      (4L, "")                           // no window -> 0.0
    ).toDF("doc_id", "text")
    val m = Corpus.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m(1L) == ((4L, 1L, 0.75)))
    assert(m(2L) == ((4L, 4L, 0.0)))
    assert(m(3L)._3 == 0.0 && m(4L)._3 == 0.0)
  }

  // ---------------------------------------------------------------- tf-idf

  test("tfidfTopTerms ranks by tf*(N/df) with token tiebreak") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common common cherry")
    ).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, common 3
    // doc 1: apple tf2*(3/1)=6, banana 1*(3/2)=1.5, common 1*1=1
    val top = Corpus.tfidfTopTerms(docs, k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token", "weight").as[(String, Double)].collect()
    assert(top.toSeq == Seq(("apple", 6.0), ("banana", 1.5)))
    // doc 3: common tf2*(3/3)=2.0 vs cherry 1*(3/2)=1.5 -> common first
    val top3 = Corpus.tfidfTopTerms(docs, k = 1)
      .filter(col("doc_id") === 3L)
      .select("token").as[String].collect()
    assert(top3.toSeq == Seq("common"))
  }

  // ---------------------------------------------------------------- partitioning invariance

  test("deterministic operators are invariant under repartitioning (property)") {
    import org.scalacheck.Gen
    import graft.operators.Scale
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const("dup"))
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val samples = Iterator.continually(doc.sample).flatten.take(120).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t, if (i % 3 == 0) "a" else "b") }
    val base = samples.toDF("doc_id", "text", "lang")

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).sorted.toSeq

    for (parts <- Seq(1, 3, 13)) {
      val docs = base.repartition(parts)
      // split labels identical
      assert(canon(docs.select(col("doc_id"),
          Scale.deterministicSplit(col("text")))) ==
        canon(base.select(col("doc_id"),
          Scale.deterministicSplit(col("text")))), s"split parts=$parts")
      // sampler keeps the same rows
      assert(canon(Corpus.stratifiedSample(docs, Seq("lang"), col("text"), 30L)
          .select("doc_id")) ==
        canon(Corpus.stratifiedSample(base, Seq("lang"), col("text"), 30L)
          .select("doc_id")), s"sample parts=$parts")
      // packing layout identical (global order is data-derived, not
      // partition-derived)
      assert(canon(Corpus.packSequences(docs, "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 50L)) ==
        canon(Corpus.packSequences(base, "doc_id",
          TextAnalysis.tokenCount(col("text")), budget = 50L)),
        s"pack parts=$parts")
    }
  }

  test("chunk with stride == size reconstructs the document exactly (property)") {
    import org.scalacheck.Gen
    val text = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val samples = Iterator.continually(text.sample).flatten.take(80).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val docs = samples.toDF("doc_id", "text")
    val rebuilt = Corpus.chunk(docs, size = 7, stride = 7)
      .groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(struct(col("chunk_id"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("text"),
        coalesce(col("rebuilt"), lit("")).as("rebuilt"))
      .as[(Long, String, String)].collect()
    joined.foreach { case (id, t, r) => assert(t == r, s"doc $id") }
  }

  // ---------------------------------------------------------------- percentiles

  test("sampledQuantiles plans a map-side top-k and is repartition-invariant") {
    val df = (1L to 5000L).map(i => (i, (i * 37 % 1000).toDouble))
      .toDF("id", "v")
    val got = Corpus.sampledQuantiles(df, col("id").cast("string"), col("v"),
      k = 200, ps = Seq(0.5, 0.9))
    val plan = df.select(md5(col("id").cast("string")).as("__tag"), col("v"))
      .orderBy("__tag").limit(200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k sample must be a partial top-k, not a global sort:\n$plan")
    val row = got.head()
    assert(row.getAs[Long]("n_rows") == 200L)
    // deterministic under repartitioning
    val again = Corpus.sampledQuantiles(df.repartition(7),
      col("id").cast("string"), col("v"), k = 200, ps = Seq(0.5, 0.9))
    assert(got.collect().toSeq == again.collect().toSeq)
    // sampled quantiles approximate the true ones (uniform values 0..999)
    val p50 = row.getAs[Double]("p50")
    assert(p50 > 350 && p50 < 650, s"p50=$p50 far from the true median ~500")
  }

  test("approxPercentiles stays within its certified rank error of " +
       "discPercentiles per group") {
    // two groups with different sizes and distributions; values are the
    // ranks themselves so |value error| == |rank error|
    val rows = (1 to 5000).map(i => ("big", i.toDouble)) ++
      (1 to 150).map(i => ("small", i.toDouble))
    val df = rows.toDF("g", "v").repartition(8)
    val ps = Seq(0.1, 0.5, 0.9)
    val exact = Corpus.discPercentiles(df, "g", col("v"), ps)
      .collect().map(r => r.getString(0) ->
        ps.map(p => r.getAs[Double]("p" + (p * 100).round.toInt))).toMap
    val approx = Corpus.approxPercentiles(df, "g", col("v"), ps, k = 200)
      .collect()
    assert(approx.length == 2)
    approx.foreach { r =>
      val g = r.getString(0)
      val err = r.getAs[Long]("err_bound")
      val n = r.getAs[Long]("n_rows")
      assert(n == (if (g == "big") 5000L else 150L))
      ps.zipWithIndex.foreach { case (p, i) =>
        val est = r.getAs[Double]("p" + (p * 100).round.toInt)
        assert(math.abs(est - exact(g)(i)) <= err.toDouble,
          s"g=$g p=$p est=$est exact=${exact(g)(i)} err=$err")
      }
      // the small group (150 < k) never compacts: exact, err 0
      if (g == "small") assert(err == 0L)
    }
  }

  test("discPercentiles picks the value at rank ceil(p*n) per group") {
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++
      Seq(("b", 5L), ("b", 1L), ("b", 9L))).toDF("g", "v")
    val got = Corpus.discPercentiles(df, "g", col("v"), Seq(0.5, 0.9, 0.99))
      .orderBy("g").collect()
    val a = got(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 50L &&
      a.getLong(2) == 90L && a.getLong(3) == 99L && a.getLong(4) == 100L)
    val b = got(1)
    // n=3: ceil(.5*3)=2 -> 5; ceil(.9*3)=3 -> 9; ceil(.99*3)=3 -> 9
    assert(b.getString(0) == "b" && b.getLong(1) == 5L &&
      b.getLong(2) == 9L && b.getLong(3) == 9L && b.getLong(4) == 3L)
  }

  // ---------------------------------------------------------------- bigram LM

  test("bigram LM: closed-form scores on a tiny corpus, in-domain text " +
    "beats gibberish, perplexity face matches Math.log/exp closed form") {
    val trainDocs = Seq(
      (0L, "the cat sat"),
      (2L, "the cat ran")
    ).toDF("doc_id", "text")
    val (bg, ug) = Corpus.trainBigramLm(trainDocs)
    // model: (the,cat)->2, (cat,sat)->1, (cat,ran)->1; histories:
    // the->2, cat->2; V = 2
    val model = bg.orderBy("w1", "w2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(model == Seq(("cat", "ran", 1L), ("cat", "sat", 1L),
      ("the", "cat", 2L)))
    assert(ug.orderBy("w1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("cat", 2L), ("the", 2L)))

    val score = Seq(
      (10L, "the cat sat"),   // all seen
      (11L, "zz qq"),         // fully OOV
      (12L, "x")              // <2 tokens: no bigrams, drops out
    ).toDF("doc_id", "text")
    val a = 0.1
    val v = 2.0
    val got = Corpus.lmScore(score, bg, ug, alpha = a)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(10L, 11L)) // doc 12 dropped
    // doc 10: p(cat|the)=(2+a)/(2+a*2), p(sat|cat)=(1+a)/(2+a*2)
    val p1 = (2 + a) / (2 + a * v); val p2 = (1 + a) / (2 + a * v)
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 0L)
    assert(got(0).getDouble(3) == (p1 + p2) / 2.0)
    // doc 11: one bigram (zz,qq), OOV: p = a/(0 + a*2) = 1/V = 0.5
    val pOov = a / (a * v)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == 1L &&
      got(1).getDouble(3) == pOov)

    val ppl = Corpus.lmPerplexity(score, bg, ug, alpha = a)
      .orderBy("doc_id").collect()
    val nll10 = -(math.log(p1) + math.log(p2)) / 2.0
    assert(math.abs(ppl(0).getDouble(2) - nll10) < 1e-12)
    assert(math.abs(ppl(0).getDouble(3) - math.exp(nll10)) < 1e-12)
    assert(math.abs(ppl(1).getDouble(2) + math.log(pOov)) < 1e-12)
  }

  test("bigram LM: in-domain text gets lower perplexity than " +
    "same-vocabulary gibberish (the CCNet filter signal)") {
    val subjects = Seq("the cat", "the dog", "a bird")
    val verbs = Seq("sat on", "ran past", "looked at")
    val objects = Seq("the mat", "the fence", "a tree")
    val docs = (for {
      (s, i) <- subjects.zipWithIndex
      (vb, j) <- verbs.zipWithIndex
      (o, k) <- objects.zipWithIndex
    } yield ((i * 9 + j * 3 + k).toLong, s"$s $vb $o")).toDF("doc_id", "text")
    val (bg, ug) = Corpus.trainBigramLm(docs)
    // gibberish: same vocabulary, reversed token order per doc breaks
    // the learned transitions
    val gib = docs.select(col("doc_id"),
      array_join(reverse(split(col("text"), " ")), " ").as("text"))
    val real = Corpus.lmPerplexity(docs, bg, ug)
      .agg(avg("perplexity")).head().getDouble(0)
    val fake = Corpus.lmPerplexity(gib, bg, ug)
      .agg(avg("perplexity")).head().getDouble(0)
    assert(real < fake,
      s"in-domain ppl $real should beat reversed-gibberish ppl $fake")
  }

  // ---------------------------------------------------------------- line dedup

  test("removeBoilerplateLines: corpus-repeated lines vanish, order and " +
    "blank lines survive, all-boilerplate docs empty out") {
    val docs = Seq(
      (1L, "unique one\nFOOTER\n\nkeep me"),
      (2L, "FOOTER\nunique two"),
      (3L, "also unique\nFOOTER"),
      (4L, "FOOTER") // only the boilerplate line -> empties out
    ).toDF("doc_id", "text")
    val got = Corpus.removeBoilerplateLines(docs, minDocs = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "unique one\n\nkeep me"), // FOOTER gone, blank line kept, order kept
      (2L, "unique two"),
      (3L, "also unique"),
      (4L, "")))
    // below the threshold nothing is removed
    val loose = Corpus.removeBoilerplateLines(docs, minDocs = 5)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(loose.toSeq == docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  // ---------------------------------------------------------------- DSIR

  test("DSIR: closed-form ratio on a two-bucket family, target-like docs " +
    "out-weigh off-target docs in both faces") {
    // deterministic 2-bucket family: bucket by whether w1 sorts before w2
    val fam: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column =
      (w1, w2) => when(w1 <= w2, "asc").otherwise("desc")
    val raw = Seq(
      (0L, "a b a b"),  // bigrams ab, ba, ab -> asc 2, desc 1
      (1L, "b a b a"),  // desc 2, asc 1
      (2L, "a b")       // asc 1
    ).toDF("doc_id", "text")
    val target = Seq((10L, "a b a b")).toDF("doc_id", "text") // asc 2, desc 1
    val a = 0.5; val bkts = 2
    // raw dist: asc 4, desc 3, N=7; target: asc 2, desc 1, N=3
    val pAsc = ((2 + a) / (3 + a * bkts)) / ((4 + a) / (7 + a * bkts))
    val pDesc = ((1 + a) / (3 + a * bkts)) / ((3 + a) / (7 + a * bkts))
    val got = Corpus.dsirWeights(raw, target, alpha = a, numBuckets = bkts,
        bucketFn = fam).orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 3L &&
      got(0).getDouble(2) == (2 * pAsc + 1 * pDesc) / 3.0)
    assert(got(1).getLong(1) == 3L &&
      got(1).getDouble(2) == (1 * pAsc + 2 * pDesc) / 3.0)
    assert(got(2).getLong(1) == 1L && got(2).getDouble(2) == pAsc)
    // target is asc-heavy: the asc-heavy raw doc must out-weigh the
    // desc-heavy one in both faces
    assert(got(0).getDouble(2) > got(1).getDouble(2))
    val lw = Corpus.dsirLogWeights(raw, target, alpha = a,
        numBuckets = bkts, bucketFn = fam).orderBy("doc_id").collect()
    val lw0 = 2 * math.log(pAsc) + 1 * math.log(pDesc)
    val lw1 = 1 * math.log(pAsc) + 2 * math.log(pDesc)
    assert(math.abs(lw(0).getDouble(2) - lw0) < 1e-12)
    assert(math.abs(lw(1).getDouble(2) - lw1) < 1e-12)
    assert(lw(0).getDouble(2) > lw(1).getDouble(2))
  }

  test("redactPii replaces every category, counts hits on the original " +
    "text, and leaves clean docs untouched") {
    val docs = Seq(
      (1L, "contact a.b+c@mail.example.org or b@x.io today"),
      (2L, "server 192.168.1.200 and 10.0.0.1 rebooted"),
      (3L, "call +1 555-123-4567 ssn 123-45-6789 ok"),
      (4L, "perfectly clean prose with nothing to hide")
    ).toDF("doc_id", "text")
    val r = Corpus.redactPii(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("text") ==
      "contact [EMAIL] or [EMAIL] today")
    assert(r(0).getAs[Long]("n_email") == 2 && r(0).getAs[Long]("n_pii") == 2)
    assert(r(1).getAs[String]("text") == "server [IP] and [IP] rebooted")
    assert(r(1).getAs[Long]("n_ipv4") == 2)
    assert(r(2).getAs[String]("text") == "call [PHONE] ssn [SSN] ok")
    assert(r(2).getAs[Long]("n_phone") == 1 && r(2).getAs[Long]("n_ssn") == 1)
    assert(r(3).getAs[String]("text") ==
      "perfectly clean prose with nothing to hide")
    assert(r(3).getAs[Long]("n_pii") == 0)
  }

  test("redactPii and maskSpansAgainst plan narrow: no Exchange, no UDF") {
    val docs = Seq((1L, "a@b.co and +1 555-123-4567")).toDF("doc_id", "text")
    val p1 = Corpus.redactPii(docs).queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"redactPii shuffled:\n$p1")
    val p2 = Corpus.maskSpansAgainst(docs, Seq(1L, 2L), n = 2)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"maskSpansAgainst shuffled:\n$p2")
    assert(!p1.contains("BatchEvalPython") && !p2.contains("BatchEvalPython"))
  }

  test("codegen'd maskSpansAgainst kernel is row-identical to the " +
    "interpreted HOF twin, including empty/short/fully-masked docs") {
    val span = "alpha beta gamma delta"
    val docs = Seq(
      (1L, s"one two $span three"),
      (2L, span),              // fully masked -> empty text
      (3L, "short"),           // shorter than n -> untouched
      (4L, ""),                // zero tokens
      (5L, s"$span $span mix"),// overlapping double occurrence
      (6L, null.asInstanceOf[String]) // null text -> ("", 0), both faces
    ).toDF("doc_id", "text")
    val hot = Corpus.duplicateSpanHashes(docs, n = 4).as[Long].collect().toSeq
    assert(hot.nonEmpty)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val fast = rows(Corpus.maskSpansAgainst(docs, hot, n = 4))
    val hof = rows(Corpus.maskSpansAgainstHof(docs, hot, n = 4))
    assert(fast == hof)
    assert(fast.find(_._1 == 2L).get._2 == "" &&
      fast.find(_._1 == 2L).get._3 == 4L)
    assert(fast.find(_._1 == 3L).get._2 == "short")
    assert(fast.find(_._1 == 4L).get._3 == 0L)
    // null text must come back ("", 0) — NOT null-short-circuit the
    // kernel (equality with the HOF face alone couldn't catch both
    // being wrong the same way)
    assert(fast.find(_._1 == 6L).get._2 == "" &&
      fast.find(_._1 == 6L).get._3 == 0L)
    // empty hot set: pass-through tokens, zero masked, both faces
    assert(rows(Corpus.maskSpansAgainst(docs, Nil, n = 4)) ==
      rows(Corpus.maskSpansAgainstHof(docs, Nil, n = 4)))
  }

  test("maskDuplicateSpans cuts corpus-repeated n-token spans everywhere " +
    "they occur, keeps unique text, and empties full duplicates") {
    // docs 1/2 share a 4-token span inside otherwise-unique text;
    // docs 5/6 are exact duplicates (every 4-gram repeats); doc 7 is
    // unique; doc 8 is too short to shingle
    val shared = "alpha beta gamma delta"
    val docs = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine $shared ten eleven twelve"),
      (5L, "copy of the very same exact document body"),
      (6L, "copy of the very same exact document body"),
      (7L, "completely unique tokens nowhere else repeated herein"),
      (8L, "too short")
    ).toDF("doc_id", "text")
    val got = Corpus.maskDuplicateSpans(docs, n = 4)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[String]("text") == "one two three four five six")
    assert(got(0).getAs[Long]("n_masked_tokens") == 4)
    assert(got(1).getAs[String]("text") ==
      "seven eight nine ten eleven twelve")
    // exact duplicates: every token covered -> empty text, present row
    assert(got(2).getAs[String]("text") == "" &&
      got(2).getAs[Long]("n_masked_tokens") == 8)
    assert(got(3).getAs[String]("text") == "")
    assert(got(4).getAs[String]("text") ==
      "completely unique tokens nowhere else repeated herein")
    assert(got(4).getAs[Long]("n_masked_tokens") == 0)
    assert(got(5).getAs[String]("text") == "too short" &&
      got(5).getAs[Long]("n_masked_tokens") == 0)
  }

  test("thresholded maskDuplicateSpans equals full masking restricted to " +
    "qualifying spans, and equals the frozen-set scrub of the same floor") {
    // 'hot' repeats 4x (qualifies at minCount=3), 'warm' repeats 2x
    // (qualifies only at the default floor): the threshold mask must cut
    // hot everywhere and keep warm verbatim
    val hot = "alpha beta gamma delta"
    val warm = "epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one $hot two"), (2L, s"three $hot four"),
      (3L, s"five $hot six"), (4L, s"seven $hot eight"),
      (5L, s"nine $warm ten"), (6L, s"eleven $warm twelve"),
      (7L, "wholly unique text nothing repeated anywhere")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val thresholded = rows(Corpus.maskDuplicateSpans(docs, n = 4, minCount = 3))
    // identity 1: ≡ the frozen-set scrub against EXACTLY the spans that
    // clear the same floor (threshold-masking = full-masking restricted
    // to qualifying spans — the covered table is built from `dup`, and
    // `dup` at floor N IS duplicateSpanHashes(minCount = N))
    val qualifying = Corpus.duplicateSpanHashes(docs, n = 4, minCount = 3)
      .as[Long].collect().toSeq
    assert(qualifying.size == 1) // only `hot` clears the floor
    assert(thresholded == rows(Corpus.maskSpansAgainst(docs, qualifying, n = 4)))
    // hot cut everywhere, warm verbatim
    assert(thresholded.find(_._1 == 1L).get._2 == "one two")
    assert(thresholded.find(_._1 == 5L).get._2 == s"nine $warm ten")
    assert(thresholded.find(_._1 == 5L).get._3 == 0L)
    // identity 2 (the q120 contrast): the default floor cuts warm too
    val full = rows(Corpus.maskDuplicateSpans(docs, n = 4))
    assert(full.find(_._1 == 5L).get._2 == "nine ten")
  }

  test("textRank: the hub word outranks symmetric spokes, re-runs are " +
    "bit-identical, fast folds track the exact face") {
    val docs = Seq((1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "hub delta")).toDF("doc_id", "text")
    val s1 = Corpus.textRank(docs, exactFolds = true).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(Seq("alpha", "beta", "gamma", "delta")
      .forall(w => s1("hub") > s1(w)), s1.toString)
    // the four spokes are structurally identical — identical scores
    assert(Seq("beta", "gamma", "delta").forall(w => s1(w) == s1("alpha")))
    val s2 = Corpus.textRank(docs, exactFolds = true).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(s2 == s1)
    val fast = Corpus.textRank(docs).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(s1.forall { case (w, v) =>
      math.abs(fast(w) - v) <= 1e-12 * math.max(1.0, v) })
  }

  test("collocations: bigram lift closed form — chance pairs score 1, " +
    "exclusive pairs score above, support floor prunes hapax noise") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"),          // x→y exclusively
      (3L, "p q"), (4L, "p q"),          // p→q exclusively
      (5L, "x q")                        // one crossover bigram
    ).toDF("doc_id", "text")
    // N = 5; c(x,y)=2, c1(x)=3, c2(y)=2 → lift = 2·5/(3·2)
    val all = Corpus.collocations(docs, minCount = 1L).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("c12"), r.getAs[Long]("c1"), r.getAs[Long]("c2"),
          r.getAs[Double]("lift")))).toMap
    assert(all(("x", "y")) == ((2L, 3L, 2L, 2.0 * 5 / (3 * 2))))
    assert(all(("p", "q")) == ((2L, 2L, 3L, 2.0 * 5 / (2 * 3))))
    assert(all(("x", "q")) == ((1L, 3L, 3L, 1.0 * 5 / (3 * 3))))
    // support floor drops the singleton crossover
    val floored = Corpus.collocations(docs, minCount = 2L).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(floored == Set(("x", "y"), ("p", "q")))
    // occurrences count, not distinct-per-doc: "a b a b" has (a,b) twice
    val rep = Corpus.collocations(Seq((1L, "a b a b")).toDF("doc_id", "text"),
        minCount = 1L).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        r.getAs[Long]("c12"))).toMap
    assert(rep(("a", "b")) == 2L && rep(("b", "a")) == 1L)
  }

  test("percentRankNormalize: integer ranks over the unique " +
    "(score, id) order, one division") {
    val scored = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 30L))
      .toDF("doc_id", "score")
    val got = Corpus.percentRankNormalize(scored, "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 1.0 / 3.0, 3L -> 2.0 / 3.0,
      4L -> 1.0))
  }

  test("readability: exact censuses and the Flesch expression") {
    val docs = Seq(
      (1L, "Hi there. One banana!"),
      // vowel-only and consonant-only words floor at 1 syllable
      (2L, "aa str"),
      (3L, "!!! ...") // no words -> dropped
    ).toDF("doc_id", "text")
    val got = Corpus.readability(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == Set(1L, 2L))
    // hi=1, there=2, one=2, banana=3 -> Y=8; W=4, S=2
    assert(got(1L) == ((4L, 2L, 8L,
      206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (8.0 / 4.0))))
    // aa=1 (one group), str=0 -> floored 1 -> Y=2; W=2, S floors at 1
    assert(got(2L) == ((2L, 1L, 2L,
      206.835 - 1.015 * (2.0 / 1.0) - 84.6 * (2.0 / 2.0))))
  }

  test("tokenDiversity: exact Gini impurity of the token distribution") {
    val docs = Seq(
      (1L, "a a b"),          // counts 2,1 -> 1 - 5/9 = 4/9
      (2L, "x y z"),          // all distinct -> 1 - 3/9 = 2/3
      (3L, "w w w w"),        // one token -> 0
      (4L, "...!!!")          // no alphanumeric tokens -> dropped
    ).toDF("doc_id", "text")
    val got = Corpus.tokenDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((3L, 4.0 / 9.0)))
    assert(got(2L) == ((3L, 6.0 / 9.0)))
    assert(got(3L) == ((4L, 0.0)))
  }
  test("linearQualityScore weights integer features and filters at " +
    "the threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean lowercase words here ok"),     // 5 tok, 0 dig, 0 up
      (2L, "SPAM 123 456 789 CALL NOW"),          // digit/upper heavy
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = graft.operators.Corpus.linearQualityScore(docs,
        threshold = 5L)
      .select("doc_id", "score").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 2*5 = 10 >= 5 kept; doc 3: 2*1 = 2 dropped
    // doc 2: 2*6 - 3*9 - 1*11 = -26 dropped
    assert(got === Map(1L -> 10L))
  }

  test("featureHash plan: one map-side-combined shuffle, no join") {
    val docs = Seq((1L, "aa bb aa cc")).toDF("doc_id", "text")
    val plan = graft.operators.Corpus.featureHash(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"feature counting must combine map-side:\n$plan")
    assert(!plan.contains("Join"),
      s"the hashing trick must need no vocabulary join:\n$plan")
  }

  test("sourceVocabularyOverlap: exact distinct-token Jaccard") {
    val docs = Seq(("A", "x y"), ("A", "y z"), ("B", "y z w"))
      .toDF("source", "text").withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    val got = graft.operators.Corpus.sourceVocabularyOverlap(docs)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", "B", 2L, 3L, 3L, 0.5)))
  }

  test("noveltyScores: fraction of corpus-unique shingles") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val got = graft.operators.Corpus.noveltyScores(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // "a b c" is shared (df 2); each doc's second shingle is unique
    assert(got === Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("vocabularyGrowth: first-occurrence buckets and running vocab") {
    val docs = Seq((0L, "x y"), (1L, "y z"), (50L, "z w"))
      .toDF("doc_id", "text")
    val got = graft.operators.Corpus.vocabularyGrowth(docs)
      .orderBy("bucket")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 3L, 3L), (1L, 1L, 4L)))
  }

  test("bpeTrain learns greedy merges and stops when pairs run out") {
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = graft.operators.Corpus.bpeTrain(docs, merges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // round 1: (a,a)=4 beats (a,b)=3; round 2: (a,b)=3 beats (aa,a)=2;
    // round 3: (aa,ab)=2; round 4: no adjacent pairs left -> early stop
    assert(got === Seq((1, "a", "a", "aa", 4L), (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  test("bpeTrainBatched equals greedy on symbol-disjoint vocabularies " +
    "and defers shared-symbol conflicts to the next fresh count") {
    // disjoint symbols, distinct weights: (x,y)=3, (z,w)=2, (p,q)=1 —
    // one batched round learns what greedy takes three rounds for,
    // with identical ranks and weights
    val disjoint = Seq((1L, "xy xy xy zw zw pq")).toDF("doc_id", "text")
    val greedy = graft.operators.Corpus.bpeTrain(disjoint, merges = 3)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val batched = graft.operators.Corpus.bpeTrainBatched(disjoint,
        merges = 3, batchSize = 8)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(batched === greedy)
    assert(batched === Seq((1, "x", "y", "xy", 3L),
      (2, "z", "w", "zw", 2L), (3, "p", "q", "pq", 1L)))
    // shared symbol: (a,b)=2 and (b,c)=2 conflict on b — the batch
    // accepts only (a,b) and re-counts, finding (ab,c)=2 exactly as
    // greedy does; batched ≡ greedy through the conflict
    val conflict = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val g2 = graft.operators.Corpus.bpeTrain(conflict, merges = 2)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    val b2 = graft.operators.Corpus.bpeTrainBatched(conflict,
        merges = 2, batchSize = 4)
      .orderBy("merge_rank")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(b2 === g2)
    assert(b2 === Seq((1, "a", "b", "ab", 2L), (2, "ab", "c", "abc", 2L)))
  }

  test("bpeSegment replays learned merges; unseen words stay chars") {
    val train = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val merges = graft.operators.Corpus.bpeTrain(train, merges = 6)
    val apply = Seq((1L, "aaab aaab ab"), (2L, "ba aab")).toDF("doc_id", "text")
    val got = graft.operators.Corpus.bpeSegment(apply, merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // doc 1: every word collapses to one learned token (3 words → 3)
    // doc 2: "ba" has no applicable rule (2 chars); "aab" → a,ab (2)
    assert(got === Seq((1L, 3L, 3L), (2L, 2L, 4L)))
  }

  test("featureHash sums collisions and reports merged-token counts") {
    import org.apache.spark.sql.functions.{col, substring}
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb")).toDF("doc_id", "text")
    // identity bucket: exact token counts survive
    val ident = graft.operators.Corpus.featureHash(docs,
        bucket = t => t)
      .orderBy("doc_id", "feature")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(ident === Seq((1L, "aa", 2L, 1L), (1L, "bb", 1L, 1L),
      (1L, "cc", 1L, 1L), (2L, "bb", 1L, 1L)))
    // a 1-char bucket forces collisions: weights sum, n_tokens counts
    val coll = graft.operators.Corpus.featureHash(docs,
        bucket = t => substring(t, 1, 1))
      .filter(col("doc_id") === 1L).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(coll === Map("a" -> ((2L, 1L)), "b" -> ((1L, 1L)),
      "c" -> ((1L, 1L))))
    // default face (xxhash64 mod dim) preserves total weight
    val total = graft.operators.Corpus.featureHash(docs)
      .agg(org.apache.spark.sql.functions.sum("weight")).collect()
      .head.getLong(0)
    assert(total === 5L)
  }

  test("jsDivergenceByToken emits exact counts and fixed-order JS terms") {
    val docs = Seq((1L, "src0", "a a b"), (2L, "src1", "a b b"))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.Corpus.jsDivergenceByToken(docs,
        col("source") === "src0", col("source") === "src1")
      .orderBy("token")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // p=2/3 vs q=1/3 (and mirrored): terms are p*ln(p/m) in fixed order
    assert(got === Seq(
      ("a", 2L, 1L, 0.19178804830118723, -0.1351550360360548),
      ("b", 1L, 2L, -0.1351550360360548, 0.19178804830118723)))
  }

  test("jsDivergenceByToken zero-count side contributes exactly 0") {
    val docs = Seq((1L, "src0", "only left"), (2L, "src1", "right side"))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.Corpus.jsDivergenceByToken(docs,
        col("source") === "src0", col("source") === "src1")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("only")._5 === 0.0 && got("only")._3 === 0L)
    assert(got("right")._4 === 0.0 && got("right")._2 === 0L)
    // one-sided token's own term: p*ln(p/(p/2)) = p*ln(2)
    assert(got("only")._4 === 0.5 * math.log(2.0))
  }

  test("naiveBayesScores matches the hand-folded two-class example") {
    val train = Seq(("spam", "buy buy cash"), ("ham", "hi hi there"))
      .toDF("label", "text")
    val test = Seq((1L, "buy cash hi")).toDF("doc_id", "text")
    val got = Corpus.naiveBayesScores(train, test, "label")
      .orderBy("label").as[(Long, String, Double)].collect().toSeq
    // V=4, T_c=3 both; terms folded token-ASC from 0.0, prior added last
    val prior = math.log(1.0 / 2.0)
    val ham = prior + (0.0 + 1.0 * math.log(1.0 / 7.0) +
      1.0 * math.log(1.0 / 7.0) + 1.0 * math.log(3.0 / 7.0))
    val spam = prior + (0.0 + 1.0 * math.log(3.0 / 7.0) +
      1.0 * math.log(2.0 / 7.0) + 1.0 * math.log(1.0 / 7.0))
    assert(got === Seq((1L, "ham", ham), (1L, "spam", spam)))
  }

  test("naiveBayesPredict: argmax, prior-only tokenless docs, tie -> asc") {
    val train = Seq(("spam", "buy buy cash"), ("ham", "hi hi there"))
      .toDF("label", "text")
    val test = Seq((1L, "buy cash"), (2L, "hi there"), (3L, "!!! ???"))
      .toDF("doc_id", "text")
    val got = Corpus.naiveBayesPredict(train, test, "label")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) ===
      Seq((1L, "spam"), (2L, "ham"), (3L, "ham"))) // 3: equal priors, asc
    assert(got(2)._3 === math.log(1.0 / 2.0)) // tokenless = prior only
  }

  test("temperatureMixSqrt: sqrt weights, sorted share fold, floor alloc") {
    val docs = Seq(("a", 60L), ("a", 40L), ("b", 400L))
      .toDF("source", "ntok")
    val got = Corpus.temperatureMixSqrt(docs, "source", "ntok", 1000000L)
      .orderBy("domain")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    val (wa, wb) = (math.sqrt(100.0), math.sqrt(400.0))
    val wsum = 0.0 + wa + wb
    assert(got === Seq(
      ("a", 100L, wa, wa / wsum, math.floor(1000000.0 * wa / wsum).toLong),
      ("b", 400L, wb, wb / wsum, math.floor(1000000.0 * wb / wsum).toLong)))
  }

  test("segmentedTtr: full blocks only, exact distinct shares") {
    val tenDistinct = (1 to 10).map(i => s"w$i").mkString(" ")
    val tenSame = Seq.fill(10)("rep").mkString(" ")
    val docs = Seq(
      (1L, tenDistinct + " " + tenSame),          // blocks: 10, 1 distinct
      (2L, tenDistinct + " " + tenSame + " tail a b c"), // remainder dropped
      (3L, "too short"))                           // no full block
      .toDF("doc_id", "text")
    val got = Corpus.segmentedTtr(docs, window = 10).orderBy("id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got(0) === ((1L, 2L, 11L, Some(11.0 / 20.0))))
    assert(got(1) === ((2L, 2L, 11L, Some(11.0 / 20.0))))
    assert(got(2) === ((3L, 0L, 0L, None)))
  }

  test("compressionRatio: repetitive text compresses far below prose") {
    val repetitive = "spam spam " * 500
    val prose = (1 to 700).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val docs = Seq((1L, repetitive), (2L, prose), (3L, ""))
      .toDF("doc_id", "text")
    val got = Corpus.compressionRatio(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(0).getDouble(3) < 0.05)
    assert(got(1).getDouble(3) > 3 * got(0).getDouble(3))
    assert(got(2).isNullAt(3) && got(2).getLong(1) === 0L)
    // deterministic: a second run reproduces the bytes exactly
    val again = Corpus.compressionRatio(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(got.map(_.getLong(2)).toSeq === again.map(_.getLong(2)).toSeq)
  }

  test("cooccurrencePairs is join-free: pairs build inside the scan stage") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val plan = Corpus.cooccurrencePairs(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("cooccurrenceCounts: forward-window unordered pairs, exact ranks") {
    // "x y z x", window 2: (x,y)x2, (x,z)x2, (y,z)x1
    val docs = Seq((1L, "x y z x")).toDF("doc_id", "text")
    val got = Corpus.cooccurrenceCounts(docs, "doc_id", "text",
        window = 2, topK = 10)
      .orderBy("rank").as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(("x", "y", 2L, 1L), ("x", "z", 2L, 2L),
      ("y", "z", 1L, 3L)))
  }

  test("rakeWordScores: phrase degree over stopword-delimited runs") {
    // phrases [big data] [pipe]: big deg2/freq1, data 2/1, pipe 1/1
    val docs = Seq((1L, "big data the pipe")).toDF("doc_id", "text")
    val got = Corpus.rakeWordScores(docs, "doc_id", "text",
        Seq("the"), topK = 10)
      .orderBy("rank").as[(String, Long, Long, Double, Long)]
      .collect().toSeq
    assert(got === Seq(("big", 1L, 2L, 2.0, 1L), ("data", 1L, 2L, 2.0, 2L),
      ("pipe", 1L, 1L, 1.0, 3L)))
  }
}
