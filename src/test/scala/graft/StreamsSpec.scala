package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("windowed watermarked aggregation over a memory stream") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedEventCounts(
      in.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      in.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(6), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(rows.contains(("click", 2L, 3.0)))
      assert(rows.contains(("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("mergeable sketches run as streaming aggregates: KLL quantiles " +
       "and heavy hitters over micro-batches keep their guarantees") {
    // TypedImperativeAggregate partial-merges across micro-batches in
    // update mode — the continuous-corpus-statistics shape: one bounded
    // sketch per key instead of a per-value shuffle per trigger
    import graft.functions.VectorExpressions
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val agg = in.toDF().toDF("g", "v")
      .groupBy("g")
      .agg(VectorExpressions.kllSketch(col("v"), 64).as("s"),
        VectorExpressions.freqSketch(col("v").cast("string"), 8).as("f"))
      .select(col("g"), col("s.n").as("n"), col("s.err_bound").as("err"),
        VectorExpressions.kllQuantile(col("s"), 0.5).as("p50"), col("f"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sk_out").start()
    try {
      // 1..100 arrive across three micro-batches, plus a hot item
      in.addData((1 to 40).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      in.addData((41 to 80).map(i => ("a", i.toDouble)): _*)
      q.processAllAvailable()
      in.addData(((81 to 100).map(i => ("a", i.toDouble)) ++
        Seq.fill(50)(("a", 7.0))): _*)
      q.processAllAvailable()
      val r = spark.table("sk_out").filter(col("g") === "a").head()
      val (n, err, p50) = (r.getAs[Long]("n"), r.getAs[Long]("err"),
        r.getAs[Double]("p50"))
      assert(n == 150L)
      // median of {1..100} ∪ {7.0 × 50}: target rank 75 → true value in
      // [7, 100]; the estimate's rank must sit within the certified bound
      val values = ((1 to 100).map(_.toDouble) ++ Seq.fill(50)(7.0)).sorted
      val rankLe = values.count(_ <= p50)
      val rankLt = values.count(_ < p50)
      assert(rankLt < 75 + err && rankLe >= 75 - err,
        s"p50=$p50 rankBand=[$rankLt+1,$rankLe] err=$err")
      // the hot item (50/150 = 33% > n/(k+1) = 150/9) must survive MG
      val hh = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("f"))
        .map(x => (x.getString(0), x.getLong(1))).toMap
      assert(hh.contains("7.0") && hh("7.0") <= 50L &&
        hh("7.0") >= 50L - 150L / 9L)
    } finally q.stop()
  }

  test("cdcUpsertStream: last emit per key equals batch mergeLatest, " +
    "replay is a no-op, tombstones propagate") {
    import graft.streaming.Streams.CdcEvent
    implicit val sc = spark.sqlContext
    val in = MemoryStream[CdcEvent]
    val q = graft.streaming.Streams.cdcUpsertStream(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out").start()
    try {
      // batch 1: three inserts
      in.addData(CdcEvent("a", 0, deleted = false, "a0"),
        CdcEvent("b", 0, deleted = false, "b0"),
        CdcEvent("c", 0, deleted = false, "c0"))
      q.processAllAvailable()
      // batch 2: update a (v1), REPLAY b's v0 (no-op by value), tombstone c,
      // stale update for a (v0 arrives after v1 in the same batch: loses)
      in.addData(CdcEvent("a", 1, deleted = false, "a1"),
        CdcEvent("a", 0, deleted = false, "aSTALE"),
        CdcEvent("b", 0, deleted = false, "b0"),
        CdcEvent("c", 1, deleted = true, "c0"))
      q.processAllAvailable()
      val emits = spark.table("cdc_out").as[CdcEvent].collect()
      // snapshot = last emit per key (what an upsert sink holds)
      val snapshot = emits.zipWithIndex
        .groupBy(_._1.key).map { case (k, g) => k -> g.maxBy(_._2)._1 }
      assert(snapshot("a") == CdcEvent("a", 1, deleted = false, "a1"))
      assert(snapshot("b") == CdcEvent("b", 0, deleted = false, "b0"))
      assert(snapshot("c") == CdcEvent("c", 1, deleted = true, "c0"))

      // the live view (drop tombstones) equals the batch face on the
      // same rows
      import spark.implicits._
      val base = Seq(("a", "a0", 0L, false), ("b", "b0", 0L, false),
        ("c", "c0", 0L, false)).toDF("key", "payload", "version", "deleted")
      val upd = Seq(("a", "a1", 1L, false), ("c", "c0", 1L, true))
        .toDF("key", "payload", "version", "deleted")
      val batch = graft.operators.Merge.mergeLatest(base, upd, Seq("key"),
          "version", deleteCol = Some("deleted"))
        .select("key", "payload").as[(String, String)].collect().toMap
      val live = snapshot.values.filter(!_.deleted)
        .map(e => e.key -> e.payload).toMap
      assert(live == batch)
    } finally q.stop()
  }

  test("incrementalBm25Ingest: streamed batches build the same view as " +
    "one batch build, replayed batch ids are no-ops") {
    import graft.operators.SearchIndex
    val all = (0L until 60L).map { i =>
      (i, s"alpha beta w${i % 7} w${i % 11} gamma w${i % 5}")
    }.toDF("doc_id", "text")
    val b1 = all.filter(col("doc_id") < 40)
    val b2 = all.filter(col("doc_id") >= 40)
    // seed an EMPTY view, stream two batches through the guarded apply
    SearchIndex.createBm25View(all.limit(0), "bm25_stream", buckets = 4)
    graft.streaming.Streams.applyBm25Batch(b1, 0L, "bm25_stream", 4,
      "doc_id", "text")
    graft.streaming.Streams.applyBm25Batch(b2, 1L, "bm25_stream", 4,
      "doc_id", "text")
    // a replayed (already-recorded) batch must change nothing
    graft.streaming.Streams.applyBm25Batch(b2, 1L, "bm25_stream", 4,
      "doc_id", "text")
    SearchIndex.createBm25View(all, "bm25_batch", buckets = 4)
    for (suffix <- Seq("", "_df", "_meta")) {
      val a = spark.table(s"bm25_stream$suffix")
      val b = spark.table(s"bm25_batch$suffix")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"drift in table suffix '$suffix'")
    }
    val q = Seq((0L, "alpha w3")).toDF("query_id", "qtext")
    assert(SearchIndex.bm25Query(spark, "bm25_stream", q, k = 5)
      .collect().toSeq ==
      SearchIndex.bm25Query(spark, "bm25_batch", q, k = 5).collect().toSeq)
    for (t <- Seq("bm25_stream", "bm25_stream_df", "bm25_stream_meta",
      "bm25_stream_ingest_meta", "bm25_batch", "bm25_batch_df",
      "bm25_batch_meta")) SearchIndex.dropView(spark, t)
  }

  test("incrementalCooccurIngest: streamed batches equal the one-shot " +
    "pair counts, replayed batch ids are no-ops") {
    import graft.operators.Corpus
    val all = (0L until 40L).map { i =>
      (i, s"alpha w${i % 3} beta w${i % 5} alpha")
    }.toDF("doc_id", "text")
    val b1 = all.filter(col("doc_id") < 25)
    val b2 = all.filter(col("doc_id") >= 25)
    graft.streaming.Streams.applyCooccurBatch(b1, 0L, "cooc_stream", 2,
      "doc_id", "text")
    graft.streaming.Streams.applyCooccurBatch(b2, 1L, "cooc_stream", 2,
      "doc_id", "text")
    // a replayed (already-recorded) batch must change nothing
    graft.streaming.Streams.applyCooccurBatch(b2, 1L, "cooc_stream", 2,
      "doc_id", "text")
    val batchFace = Corpus.cooccurrencePairs(all, "doc_id", "text", 2)
    val streamed = spark.table("cooc_stream")
    assert(streamed.exceptAll(batchFace).isEmpty &&
      batchFace.exceptAll(streamed).isEmpty)
    spark.sql("DROP TABLE IF EXISTS cooc_stream")
    spark.sql("DROP TABLE IF EXISTS cooc_stream_ingest_meta")
  }

  test("streaming dedup with bounded state drops duplicate keys") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val out = Streams.dedupStream(in.toDF().toDF("ts", "k"), "k")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("k").as[Long]
        .collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streamingNearDups finds pairs across micro-batches, matching batch LSH") {
    implicit val sc = spark.sqlContext
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    def mut(i: Int) = base.split(" ").updated(i, s"MUT$i").mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = Streams.streamingNearDups(
      in.toDF().toDF("doc_id", "ts", "text"), minJaccard = 0.5)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      // batch 1: original + an unrelated doc; batch 2: near-dups arrive
      in.addData((1L, ts(0), base), (9L, ts(1), "completely different words " * 12))
      q.processAllAvailable()
      assert(spark.table("neardup_out").count() == 0)
      in.addData((2L, ts(5), base), (3L, ts(6), mut(7)))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // cross-batch: doc 2 (exact dup) and doc 3 (near-dup) pair with doc 1
      assert(got.contains((1L, 2L)))
      assert(got.contains((1L, 3L)))
      assert(!got.exists { case (a, b) => a == 9L || b == 9L })
      // agrees with the batch operator on the same corpus/config
      val docs = Seq((1L, base), (9L, "completely different words " * 12),
        (2L, base), (3L, mut(7))).toDF("doc_id", "text")
      val batch = graft.operators.Dedup
        .minHashLsh(docs, n = 3, k = 16, bands = 4)
        .filter($"est_jaccard" >= 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("incrementalIngest accumulates the index and matches batch LSH pairs") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.{col, least, greatest}
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    def mut(i: Int) = base.split(" ").updated(i, s"MUT$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    // seed an EMPTY index with the right bucketing spec
    graft.operators.Dedup.writeLshIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      n = 3, k = 16, bands = 4, table = "ingest_idx")
    val in = MemoryStream[(Long, String)]
    val q = Streams.incrementalIngest(in.toDF().toDF("doc_id", "text"),
      "ingest_idx", s"$dir/pairs", s"$dir/ckpt", n = 3, k = 16, bands = 4)
    try {
      // batch 1 has a within-batch near-dup pair; batch 2 pairs across
      in.addData((1L, base), (2L, mut(3)), (9L, "entirely other tokens " * 14))
      q.processAllAvailable()
      in.addData((3L, mut(11)))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/pairs")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val docs = Seq((1L, base), (2L, mut(3)),
        (9L, "entirely other tokens " * 14), (3L, mut(11)))
        .toDF("doc_id", "text")
      val batch = graft.operators.Dedup.minHashLsh(docs, n = 3, k = 16, bands = 4)
        .select(least(col("id_a"), col("id_b")).as("a"),
          greatest(col("id_a"), col("id_b")).as("b"))
        .as[(Long, Long)].collect().toSet
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ingest_idx")
    }
  }

  test("streamingNearDups caps per-bucket state on a viral cluster") {
    implicit val sc = spark.sqlContext
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = Streams.streamingNearDups(
      in.toDF().toDF("doc_id", "ts", "text"), minJaccard = 0.9,
      maxPerBucket = 3)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("viral_out").start()
    try {
      in.addData((1 to 10).map(i => (i.toLong, ts(i), base)): _*)
      q.processAllAvailable()
      val pairs = spark.table("viral_out")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // only the first 3 arrivals are retained per bucket: every doc
      // matches against at most those, so pair count is bounded at
      // 3 + 7*3 = 24 per band-dedup, not the 45 of the full clique
      assert(pairs.nonEmpty)
      assert(pairs.forall { case (a, _) => a <= 3 })
    } finally q.stop()
  }

  test("incrementalVectorIngest accumulates the IVF index across batches") {
    implicit val sc = spark.sqlContext
    def vec(seed: Long) = Array.tabulate(8)(d => math.sin(seed * 8 + d + 1).toFloat)
    val cents = (0 until 3).map(i =>
      i -> Array.tabulate(8)(d => math.cos(i * 8 + d + 1).toFloat))
    val dir = Files.createTempDirectory("sivf").toString
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.Streams.incrementalVectorIngest(
      in.toDF().toDF("vec_id", "embedding"), cents,
      s"$dir/idx", s"$dir/ckpt")
    try {
      in.addData((0L until 10L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      in.addData((10L until 20L).map(i => (i, vec(i))): _*)
      q.processAllAvailable()
      // both batches landed in the partitioned layout...
      val idx = spark.read.parquet(s"$dir/idx")
      assert(idx.count() == 20L)
      // ...with the same assignment a batch build would produce
      val want = graft.operators.Similarity.assignCells(
        (0L until 20L).map(i => (i, vec(i))).toDF("nbr_id", "nbr_vec"),
        cents, "nbr_vec", 1)
        .select("nbr_id", "cell_id").as[(Long, Int)].collect().sorted.toSeq
      assert(idx.select("nbr_id", "cell_id").as[(Long, Int)]
        .collect().sorted.toSeq == want)
      // and probes over the streamed index find a twin vector at top-1
      val r = graft.operators.Similarity.queryIvfIndex(spark, s"$dir/idx",
        cents, Seq((5L, vec(5L))).toDF("vec_id", "embedding"),
        k = 1, nProbe = 3)
      assert(r.count() == 1L)
    } finally q.stop()
  }

  test("incrementalPqIngest streams PQ codes matching the batch index") {
    implicit val sc = spark.sqlContext
    def vec(seed: Long) = Array.tabulate(8)(d => math.sin(seed * 8 + d + 1).toFloat)
    val cents = (0 until 3).map(i =>
      i -> Array.tabulate(8)(d => math.cos(i * 8 + d + 1).toFloat))
    val allRows = (0L until 20L).map(i => (i, vec(i)))
    val cb = graft.operators.Similarity.pqCodebooksFromRows(
      allRows.take(8).toDF("vec_id", "embedding"), dim = 8, m = 2, k = 4)
    val dir = Files.createTempDirectory("sivfpq").toString
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.Streams.incrementalPqIngest(
      in.toDF().toDF("vec_id", "embedding"), cents, cb,
      s"$dir/idx", s"$dir/ckpt")
    try {
      in.addData(allRows.take(10): _*)
      q.processAllAvailable()
      in.addData(allRows.drop(10): _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/idx")
        .select("nbr_id", "codes", "cell_id")
        .as[(Long, Seq[Int], Int)].collect().toSet
      // identical rows to a one-shot batch build of the same corpus
      val batchDir = Files.createTempDirectory("bivfpq").toString + "/idx"
      graft.operators.Similarity.writeIvfPqIndex(
        allRows.toDF("vec_id", "embedding"), cents, cb, batchDir)
      val want = spark.read.parquet(batchDir)
        .select("nbr_id", "codes", "cell_id")
        .as[(Long, Seq[Int], Int)].collect().toSet
      assert(got == want && got.size == 20)
    } finally q.stop()
  }

  test("incrementalHierPqIngest streams two-level codes matching the " +
       "batch append, probed jointly with a refresh root") {
    implicit val sc = spark.sqlContext
    def vec(seed: Long) = Array.tabulate(16)(d => math.sin(seed * 16 + d + 1).toFloat)
    val allRows = (0L until 24L).map(i => (i, vec(i)))
    val corpus = allRows.toDF("vec_id", "embedding")
    val hq = graft.operators.Similarity.trainHierQuantizer(
      corpus, nCells = 9, sampleBudget = 24)
    val cb = graft.operators.Similarity.pqCodebooksFromRows(
      corpus, dim = 16, m = 4, k = 4)
    val dir = Files.createTempDirectory("shier").toString
    val in = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.Streams.incrementalHierPqIngest(
      in.toDF().toDF("vec_id", "embedding"), hq, cb,
      s"$dir/idx", s"$dir/ckpt")
    try {
      in.addData(allRows.take(12): _*)
      q.processAllAvailable()
      in.addData(allRows.drop(12): _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/idx")
        .select("nbr_id", "codes", "cell_id")
        .as[(Long, Seq[Int], Int)].collect().toSet
      // identical rows to the batch append of the same corpus
      graft.operators.Similarity.appendToIvfPqIndexHier(
        corpus, hq, cb, s"$dir/batch_idx")
      val want = spark.read.parquet(s"$dir/batch_idx")
        .select("nbr_id", "codes", "cell_id")
        .as[(Long, Seq[Int], Int)].collect().toSet
      assert(got == want && got.size == 24)
      // joint probe over a refresh-built root + the streamed root sees
      // rows from BOTH layouts, and still prunes on cell_id
      graft.operators.Similarity.appendToIvfPqIndexHier(
        (100L until 104L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        hq, cb, s"$dir/flat_idx")
      val joint = graft.operators.Similarity.queryIvfPqIndexHierPaths(
        spark, Seq(s"$dir/flat_idx", s"$dir/idx"), hq, cb,
        (0L until 2L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        k = 24, nProbe = 9, probeTop = 3)
      val ids = joint.select("nbr_id").as[Long].collect().toSet
      assert(ids.exists(_ >= 100L) && ids.exists(_ < 24L))
      val plan = graft.operators.Similarity.queryIvfPqIndexHierPaths(
        spark, Seq(s"$dir/flat_idx", s"$dir/idx"), hq, cb,
        (0L until 2L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
        k = 2, nProbe = 2, probeTop = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell_id"),
        s"expected partition pruning in:\n$plan")
    } finally q.stop()
  }

  test("incrementalTuples writes tuples per micro-batch via foreachBatch") {
    val dir = Files.createTempDirectory("stream")
    val src = dir.resolve("in"); Files.createDirectories(src)
    val out = dir.resolve("out").toString
    val ckp = dir.resolve("ckp").toString

    // one results file appears in the watched directory
    Seq(("c1", 100L, 0.5, 0.25, 1L, 2L, 3L, 4L, 2L,
      "['GeneA']", "['GeneB']", "abc123def456"))
      .toDF("clusterName", "clusterSize", "f_score", "precision", "TN", "FP",
        "FN", "TP", "marker_count", "NSForest_markers", "binary_genes", "uuid")
      .write.parquet(src.toString + "/batch1")

    val schema = spark.read.parquet(src.toString + "/batch1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 10)
      .parquet(src.toString + "/*")
    val q = Streams.incrementalTuples(stream, Seq("dv1"), out, ckp)
    try q.processAllAvailable() finally q.stop()

    val tuples = spark.read.parquet(out)
    // 2 head + 2 (one gene) + 4 relations + 4 node-ann + 0 silhouette +
    // 3 more-ann + 8 edge-ann + 2 provenance = 25
    assert(tuples.count() == 25)
  }

  test("flatMapGroupsWithState sessionization closes on gap and on timeout") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val sessions = Streams.sessionize(
      in.toDF().toDF("ts", "event_type", "value").as[Streams.SessionEvent],
      watermark = "30 minutes", gapMs = 30L * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // session 1: two clicks 5 minutes apart
      in.addData((ts(0), "click", 1.0), (ts(5), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // still open
      // a click 120 minutes later: past the gap -> session 1 closes
      in.addData((ts(120), "click", 4.0))
      q.processAllAvailable()
      val afterGap = spark.table("sess_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(afterGap == Set(("click", 2L, 3.0)))
      // a far-future event on ANOTHER key advances the watermark past
      // session 2's timeout -> it closes via hasTimedOut
      in.addData((ts(1000), "view", 9.0))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_out")
        .select("event_type", "n", "sum_value").as[(String, Long, Double)]
        .collect().toSet
      assert(afterTimeout.contains(("click", 1L, 4.0)))
    } finally q.stop()
  }

  test("native session_window sessionization emits the same sessions as " +
      "the custom-state face") {
    implicit val sc = spark.sqlContext
    val inA = MemoryStream[(Timestamp, String, Double)]
    val inB = MemoryStream[(Timestamp, String, Double)]
    val custom = Streams.sessionize(
      inA.toDF().toDF("ts", "event_type", "value").as[Streams.SessionEvent],
      watermark = "30 minutes", gapMs = 30L * 60 * 1000)
    val native = Streams.sessionizeNative(
      inB.toDF().toDF("ts", "event_type", "value"),
      watermark = "30 minutes", gapMs = 30L * 60 * 1000)
    val qA = custom.writeStream.outputMode("append")
      .format("memory").queryName("sess_custom").start()
    val qB = native.writeStream.outputMode("append")
      .format("memory").queryName("sess_native").start()
    try {
      val batches = Seq(
        Seq((ts(0), "click", 1.0), (ts(5), "click", 2.0), (ts(3), "view", 7.0)),
        Seq((ts(120), "click", 4.0), (ts(125), "view", 1.0)),
        // far-future watermark push so every prior session emits in both
        Seq((ts(100000), "other", 0.0)))
      batches.foreach { b =>
        inA.addData(b); inB.addData(b)
        qA.processAllAvailable(); qB.processAllAvailable()
      }
      def rows(tbl: String) = spark.table(tbl)
        .select("event_type", "win_start", "win_end", "n", "sum_value")
        .as[(String, Timestamp, Timestamp, Long, Double)].collect().toSet
      val got = rows("sess_native")
      assert(got == rows("sess_custom"))
      assert(got.contains(("click", ts(0), ts(5), 2L, 3.0)))
    } finally { qA.stop(); qB.stop() }
  }

  test("streaming boilerplate-line scrub against a frozen hot set is " +
    "emit-identical to the batch face, stateless") {
    import graft.operators.Corpus
    implicit val sc = spark.sqlContext
    val hist = Seq(
      (1L, "a\nFOOTER\nb"), (2L, "FOOTER\nc"), (3L, "d\nFOOTER")
    ).toDF("doc_id", "text")
    val hot = Corpus.boilerplateLines(hist, minDocs = 3)
      .as[String].collect().toSeq
    assert(hot == Seq("FOOTER"))
    val in = MemoryStream[(Long, String)]
    val q = Streams.removeBoilerplateStream(
        in.toDF().toDF("doc_id", "text"), hot)
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_out").start()
    try {
      val newDocs = Seq((10L, "x\nFOOTER\ny"), (11L, "FOOTER"),
        (12L, "plain"))
      in.addData(newDocs: _*)
      q.processAllAvailable()
      val got = spark.table("scrub_out").as[(Long, String)]
        .collect().sortBy(_._1).toSeq
      val batch = Corpus.removeLines(newDocs.toDF("doc_id", "text"),
          hot.toDF("line"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == batch)
      assert(got == Seq((10L, "x\ny"), (11L, ""), (12L, "plain")))
    } finally q.stop()
  }

  test("stream-stream attribution join matches clicks in the preceding " +
    "window, inclusive, and equals the batch face") {
    import graft.operators.Events
    implicit val sc = spark.sqlContext
    def t(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    val pIn = MemoryStream[(Long, Timestamp, Long)]
    val cIn = MemoryStream[(Long, Timestamp, Long)]
    val q = Streams.attributionJoin(
        pIn.toDF().toDF("user_id", "ts", "event_id"),
        cIn.toDF().toDF("user_id", "ts", "click_id"),
        withinSeconds = 600L) // 10-minute attribution window
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      val clicks = Seq((1L, t(0), 10L), (1L, t(8), 11L), (1L, t(30), 12L),
        (2L, t(5), 13L))
      val purchases = Seq((1L, t(9), 100L), (1L, t(31), 101L),
        (2L, t(40), 102L))
      cIn.addData(clicks: _*)
      pIn.addData(purchases: _*)
      q.processAllAvailable()
      // advance both watermarks far past the window so all matches emit
      cIn.addData((9L, t(500), 99L)); pIn.addData((9L, t(500), 999L))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("purchase_id", "click_id")
        .as[(Long, Long)].collect().toSet
      // purchase 100 at t9: clicks t0 (9 min before) and t8; purchase
      // 101 at t31: click t30 only (t8 is 23 min before); purchase 102
      // at t40: user 2's click t5 is 35 min before -> no match
      val expected = Set((100L, 10L), (100L, 11L), (101L, 12L))
      assert((got -- Set((999L, 99L))) == expected)
      // batch twin: the same pairs via rangeJoin over click intervals
      val batch = Events.rangeJoin(
          purchases.toDF("user_id", "ts", "event_id")
            .select(col("user_id"), col("event_id"),
              unix_micros(col("ts")).as("p_us")),
          clicks.toDF("user_id", "ts", "click_id")
            .select(col("user_id"), col("click_id"),
              unix_micros(col("ts")).as("c_us"),
              (unix_micros(col("ts")) + 600L * 1000000L).as("c_end")),
          "user_id", "p_us", "c_us", "c_end")
        .select("event_id", "click_id")
        .as[(Long, Long)].collect().toSet
      assert(batch == expected)
    } finally q.stop()
  }

  test("streaming span scrub against a frozen duplicated-span set is " +
    "emit-identical to the batch masker, stateless") {
    import graft.operators.Corpus
    implicit val sc = spark.sqlContext
    val hist = Seq(
      (1L, "one two three alpha beta gamma delta four"),
      (2L, "five six alpha beta gamma delta seven eight"),
      (3L, "totally unrelated words in this document here")
    ).toDF("doc_id", "text")
    val hot = Corpus.duplicateSpanHashes(hist, n = 4)
      .as[Long].collect().toSeq
    assert(hot.size == 1) // exactly the shared 4-gram
    val in = MemoryStream[(Long, String)]
    val q = Streams.maskSpansStream(in.toDF().toDF("doc_id", "text"), hot,
        n = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("span_out").start()
    try {
      val newDocs = Seq(
        (10L, "prefix alpha beta gamma delta suffix"),
        (11L, "alpha beta gamma delta"),
        (12L, "clean text stays token for token"))
      in.addData(newDocs: _*)
      q.processAllAvailable()
      val got = spark.table("span_out").as[(Long, String, Long)]
        .collect().sortBy(_._1).toSeq
      assert(got == Seq((10L, "prefix suffix", 4L), (11L, "", 4L),
        (12L, "clean text stays token for token", 0L)))
      // frozen-set face ≡ batch face on the corpus the set came from
      val viaStream = Corpus.maskSpansAgainst(hist, hot, n = 4)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      val viaBatch = Corpus.maskDuplicateSpans(hist, n = 4)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(viaStream == viaBatch)
    } finally q.stop()
  }
  test("cusumAlarmStream: last emit per key equals the batch CUSUM face") {
    import graft.streaming.Streams.{CusumEvent, CusumStat}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[CusumEvent]
    val q = Streams.cusumAlarmStream(in.toDS(), target = 10L,
        threshold = 10L)
      .writeStream.outputMode("update")
      .format("memory").queryName("cusum_out").start()
    try {
      // key 1 series (x=15,15,2,15): S=5,10,2,7 -> alarm at i=2
      in.addData(CusumEvent(1L, 2, 0, 15L), CusumEvent(1L, 1, 0, 15L),
        CusumEvent(2L, 1, 0, 5L)) // out-of-order WITHIN the batch: sorted
      q.processAllAvailable()
      in.addData(CusumEvent(1L, 3, 0, 2L), CusumEvent(1L, 4, 0, 15L))
      q.processAllAvailable()
      val emits = spark.table("cusum_out").as[CusumStat].collect()
      val last = emits.zipWithIndex.groupBy(_._1.key)
        .map { case (k, g) => k -> g.maxBy(_._2)._1 }
      assert(last(1L) == CusumStat(1L, 4L, 10L, Some(2L)))
      assert(last(2L) == CusumStat(2L, 1L, 0L, None))

      // equals the batch face over the same rows
      val rows = Seq((1L, 1L, 0L, 15L), (1L, 2L, 0L, 15L),
        (1L, 3L, 0L, 2L), (1L, 4L, 0L, 15L), (2L, 1L, 0L, 5L))
        .toDF("k", "o1", "o2", "v")
      val batch = graft.operators.Stats.cusumAlarms(rows, "k", "o1", "o2",
          "v", target = 10L, threshold = 10L)
        .as[(Long, Long, Long, Option[Long])].collect()
        .map(r => r._1 -> CusumStat(r._1, r._2, r._3, r._4)).toMap
      assert(last === batch)
    } finally q.stop()
  }

  test("decayScoreStream: last emit equals the dyadic EWMA batch face " +
    "over the batch-sum series") {
    import graft.streaming.Streams.{DecayEvent, DecayScore}
    implicit val sc = spark.sqlContext
    val in = MemoryStream[DecayEvent]
    val q = Streams.decayScoreStream(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("decay_out").start()
    try {
      in.addData(DecayEvent(1L, 3L), DecayEvent(1L, 1L), DecayEvent(2L, 8L))
      q.processAllAvailable() // key 1 batch sum 4 -> 4.0; key 2 -> 8.0
      in.addData(DecayEvent(1L, 2L))
      q.processAllAvailable() // key 1: (2 + 4)/2 = 3.0
      in.addData(DecayEvent(1L, 5L), DecayEvent(2L, 2L))
      q.processAllAvailable() // key 1: (5 + 3)/2 = 4.0; key 2: (2+8)/2 = 5.0
      val emits = spark.table("decay_out").as[DecayScore].collect()
      val last = emits.zipWithIndex.groupBy(_._1.key)
        .map { case (k, g) => k -> g.maxBy(_._2)._1 }
      assert(last(1L) == DecayScore(1L, 3L, 4.0))
      assert(last(2L) == DecayScore(2L, 2L, 5.0))

      // ≡ the batch EWMA face over the per-batch sums
      val series = Seq((1L, 1L, 4L), (1L, 2L, 2L), (1L, 3L, 5L),
        (2L, 1L, 8L), (2L, 3L, 2L)).toDF("k", "t", "n")
      val batch = graft.operators.Events
        .ewmaDyadic(series, "k", Seq("t"), "n", depth = 8)
        .groupBy("k").agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.col("ewma"),
          org.apache.spark.sql.functions.col("t")).as("e"))
        .as[(Long, Double)].collect().toMap
      assert(batch(1L) === last(1L).score && batch(2L) === last(2L).score)
    } finally q.stop()
  }

  test("twapStream: stream-final twap equals the batch face across " +
    "batch splits") {
    import graft.streaming.Streams.{TwapEvent, TwapRow}
    implicit val sc = spark.sqlContext
    val events = Seq(
      TwapEvent(1L, 0L, 1L, 10L), TwapEvent(1L, 10L, 2L, 30L),
      TwapEvent(1L, 40L, 3L, 99L), TwapEvent(2L, 5L, 4L, 7L))
    val in = MemoryStream[TwapEvent]
    val q = Streams.twapStream(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("twap_out").start()
    try {
      // split mid-timeline: the interval crossing the split must count
      in.addData(events.take(2))
      q.processAllAvailable()
      in.addData(events.drop(2))
      q.processAllAvailable()
      val emits = spark.table("twap_out").as[TwapRow].collect()
      val last = emits.zipWithIndex.groupBy(_._1.key)
        .map { case (k, g) => k -> g.maxBy(_._2)._1 }
      assert(last(1L) == TwapRow(1L, 3L, 40L, Some(25.0)))
      assert(last(2L) == TwapRow(2L, 1L, 0L, None))
      // ≡ the batch face on the same events
      val batch = graft.operators.Events.timeWeightedAvg(
        events.toDF("user_id", "us", "event_id", "v")
          .withColumn("ts", timestamp_micros(col("us"))),
        "user_id", "ts", "event_id", "v")
        .orderBy("user_id").collect()
      assert(batch(0).getDouble(3) === last(1L).twap.get &&
        batch(0).getLong(2) === last(1L).span_us)
      assert(batch(1).isNullAt(3) && last(2L).twap.isEmpty)
    } finally q.stop()
  }

  test("debounceStream: streamed survivors equal the batch debounce face " +
    "under arbitrary batch splits") {
    import graft.streaming.Streams.DebounceEvent
    implicit val sc = spark.sqlContext
    val events = Seq( // key a: bursts; key b: isolated
      DebounceEvent("a", 0L, 1L), DebounceEvent("a", 100000000L, 2L),
      DebounceEvent("a", 400000000L, 3L), DebounceEvent("a", 700000001L, 4L),
      DebounceEvent("b", 0L, 5L), DebounceEvent("b", 300000000L, 6L))
    val in = MemoryStream[DebounceEvent]
    val q = Streams.debounceStream(in.toDS(), windowSeconds = 300L)
      .writeStream.outputMode("update")
      .format("memory").queryName("deb_out").start()
    try {
      // split mid-burst: the state must carry the predecessor across
      in.addData(events.take(2))
      q.processAllAvailable()
      in.addData(events.slice(2, 4))
      q.processAllAvailable()
      in.addData(events.drop(4))
      q.processAllAvailable()
      val streamed = spark.table("deb_out").as[DebounceEvent]
        .collect().map(_.eventId).sorted.toSeq

      // debounce's us() expects a timestamp column, so feed the long
      // micros through timestamp_micros first
      val asTs = events.toDF()
        .withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros(org.apache.spark.sql.functions.col("us")))
      val batchIds = graft.operators.Events.debounce(
        asTs, Seq("key"), "ts", 300L, "eventId")
        .select("eventId").as[Long].collect().sorted.toSeq
      assert(streamed === batchIds)
      // the memoryless rule on key a: 1 survives, 2 within 300s of 1
      // dies, 3 opens exactly 300s from 2 (>= window) and survives,
      // 4 is 300.000001s after 3; key b: gap 300s exactly -> both
      assert(streamed === Seq(1L, 3L, 4L, 5L, 6L))
    } finally q.stop()
  }

  test("file-source twin feed: pre-written batch 0 + appended batch 1 " +
    "cross the state boundary with no driver-side data collect") {
    // the q299/q300/q302 gate feed pattern (VERDICT r9 item 2): batch 0
    // written as parquet BEFORE the stream starts, batch 1 appended as
    // NEW files after the first processAllAvailable — two genuine
    // micro-batches, fed and drained entirely executor-side
    import graft.streaming.Streams.DebounceEvent
    val feed = Files.createTempDirectory("twin-feed")
      .resolve("feed").toString
    Seq(DebounceEvent("a", 0L, 1L), DebounceEvent("a", 100000000L, 2L))
      .toDS().write.parquet(feed)
    val in = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[DebounceEvent]].schema)
      .parquet(feed).as[DebounceEvent]
    val q = Streams.debounceStream(in, windowSeconds = 300L)
      .writeStream.outputMode("update")
      .format("memory").queryName("feed_out").start()
    try {
      q.processAllAvailable()
      // only batch 0 so far: 1 survives, 2 debounced (gap 100s < 300s)
      assert(spark.table("feed_out").as[DebounceEvent]
        .collect().map(_.eventId).sorted.toSeq == Seq(1L))
      Seq(DebounceEvent("a", 200000000L, 3L), // suppressed ONLY if the
          // batch-0 predecessor (us=100s) crossed the boundary in state
          DebounceEvent("a", 500000000L, 4L),
          DebounceEvent("b", 0L, 5L))
        .toDS().write.mode("append").parquet(feed)
      q.processAllAvailable()
      val streamed = spark.table("feed_out").as[DebounceEvent]
        .collect().map(_.eventId).sorted.toSeq
      // a lost state boundary would let 3 through (no predecessor seen)
      assert(streamed == Seq(1L, 4L, 5L),
        s"expected cross-batch debounce state, got $streamed")
    } finally q.stop()
  }
}
