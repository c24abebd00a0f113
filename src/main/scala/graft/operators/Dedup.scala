package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.chaining._
import org.apache.spark.sql.expressions.Window

/**
 * Deduplication operators for large-scale training-data pipelines.
 *
 * All variants are pure DataFrame plans — shuffle-on-key aggregations and
 * equi-joins only, so they scale linearly with executors:
 *
 *  - exact: hash-groupBy on content (one shuffle);
 *  - MinHash + LSH: shingle → k minhashes → b bands → bucket equi-join —
 *    the candidate join is an equi-join on (band, signature), never a
 *    cross join;
 *  - SimHash: 64-bit sign-of-weighted-bits fingerprint, near-dups by
 *    hamming distance ≤ t within LSH buckets;
 *  - n-gram Jaccard: exact verification on candidate pairs.
 *
 * Determinism: all "random" hash families derive from xxhash64 with a
 * per-member literal salt — reproducible across runs/partitions with no
 * RNG state.
 */
object Dedup {

  /** Exact dedup: one survivor per identical `text`, lowest `id` wins.
    * One hash-aggregate; at 100 TB group on a 64-bit content hash first so
    * the shuffle key is 8 bytes, not the document body. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", xxhash64(col(textCol)))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exploded (id, shingle) rows: distinct word n-grams per document.
    *
    * The window/join/distinct loop is one codegen'd call per row
    * (WordShingles) — the interpreted transform/slice/concat_ws HOF
    * formulation it replaces re-evaluated a lambda per window position and
    * alone cost ~2.3 s of q37's 5 s at sf0.1 (DedupSpec pins
    * byte-equality between the two forms). */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol), split(lower(col(textCol)), "\\s+").as("__words"))
      .select(col(idCol),
        explode(graft.functions.VectorExpressions.wordShingles(col("__words"), n))
          .as("shingle"))

  /** The interpreted HOF formulation [[shingleRows]] replaced — kept as the
    * equivalence witness (DedupSpec asserts identical output). */
  private[graft] def shingleRowsHof(docs: DataFrame, idCol: String,
                                    textCol: String, n: Int): DataFrame = {
    val w = col("__words")
    docs
      .select(col(idCol), split(lower(col(textCol)), "\\s+").as("__words"))
      .select(col(idCol), explode(array_distinct(filter(
        transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
          i => when(i + n <= size(w),
            concat_ws(" ", slice(w, i + lit(1), lit(n))))),
        x => x.isNotNull))).as("shingle"))
  }

  /** Duplicate-passage mining: word `n`-gram spans that appear in at
    * least `minDocs` distinct documents — the signal behind exact
    * duplicated-substring dedup (long repeated passages: boilerplate,
    * licenses, templated spam). Returns (shingle, n_docs, example_id),
    * where example_id is the smallest carrying doc. At corpus scale
    * group on a hash of the shingle instead of the raw span (set
    * `hashKey = true`) so the shuffle moves 16-byte keys, keeping one
    * min-exemplar span per hash for reporting. The hash key is md5
    * (128-bit): with billions of distinct n-grams a 64-bit key would hit
    * birthday collisions (~50% at 5×10⁹ keys), silently merging distinct
    * shingles and inflating n_docs; 128 bits keeps the collision odds
    * negligible at any corpus size. */
  def duplicatePassages(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 8,
                        minDocs: Int = 2,
                        hashKey: Boolean = false): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val grouped =
      if (hashKey)
        // 16-byte (128-bit) keys shuffle; one min-exemplar span per hash
        // survives. unhex(md5) not xxhash64: 64 bits birthday-collide over
        // billions of distinct n-grams
        sh.groupBy(unhex(md5(col("shingle"))).as("__k"))
          .agg(min(col("shingle")).as("shingle"),
            countDistinct(col(idCol)).as("n_docs"),
            min(col(idCol)).as("example_id"))
      else
        // group on the span itself: shuffling it once as the key is
        // strictly cheaper than key + min-agg payload copies
        sh.groupBy("shingle")
          .agg(countDistinct(col(idCol)).as("n_docs"),
            min(col(idCol)).as("example_id"))
    grouped.filter(col("n_docs") >= minDocs)
      .select("shingle", "n_docs", "example_id")
  }

  /** MinHash signatures: k hash functions = xxhash64 salted by member index;
    * signature[j] = min over shingles. Returns (idCol, sig array<long>). */
  /** Default minhash family: xxhash64 salted by member index (fast,
    * codegen'd). `mdHashFamily` is a slower md5-string family whose min
    * is reproducible in any SQL engine — used by the oracle-checked
    * signature query. */
  val xxHashFamily: (Int, Column) => Column =
    (j, sh) => xxhash64(lit(j), sh)
  val md5HashFamily: (Int, Column) => Column =
    (j, sh) => md5(concat(lit(j.toString), lit(":"), sh))

  def minHashSignatures(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 3, k: Int = 32,
                        hashFamily: (Int, Column) => Column = xxHashFamily): DataFrame = {
    val sh = shingleRows(docs, idCol, textCol, n)
    val aggs = (0 until k).map(j => min(hashFamily(j, col("shingle"))).as(s"h$j"))
    sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** MinHash + LSH candidate pairs: band the signature (b bands × r rows),
    * equi-join on (band, band-signature), keep pairs sharing ≥1 bucket.
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard =
    * fraction of agreeing minhash members. */
  /** Band-bucket hash families (same injectability as the member hash:
    * md5 is SQL-oracle-reproducible). */
  val xxBucketFamily: (Int, Column) => Column =
    (b, c) => xxhash64(lit(b), c).cast("string")
  val md5BucketFamily: (Int, Column) => Column =
    (b, c) => md5(concat(lit(b.toString), lit(":"), c))

  /** @param hotBucketThreshold when > 0, buckets with more than this many
    *        members take a salted self-join path: the probe side keys each
    *        row by hash(id) % hotSalts and the build side replicates
    *        `hotSalts` ways, so one viral bucket (m members → m² candidate
    *        pairs) spreads across `hotSalts` tasks instead of funnelling
    *        into one straggler. Result-identical to the plain join (each
    *        pair meets at exactly one salt); cold buckets keep the plain
    *        equi-join. 0 (default) = rely on AQE skew handling only.
    * @param hotSalts fan-out for the hot-bucket path */
  def minHashLsh(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                 n: Int = 3, k: Int = 32, bands: Int = 8,
                 hashFamily: (Int, Column) => Column = xxHashFamily,
                 bucketFamily: (Int, Column) => Column = xxBucketFamily,
                 hotBucketThreshold: Long = 0L, hotSalts: Int = 16): DataFrame = {
    // the signature AND banded tables are read by several plan branches
    // (both candidate sides; the hot-count and tag joins when salting is
    // on) — persist both so the shingle+agg and band-hash lineage runs
    // once (both are small: |docs| × k longs / × bands rows), and release
    // them as soon as the (smaller) pair result is materialized
    val sigs = minHashSignatures(docs, idCol, textCol, n, k, hashFamily)
    val banded = bandedOf(sigs, idCol, k, bands, bucketFamily)
    Exec.withPersisted(sigs, banded) {
      candidatePairs(banded, k, hotBucketThreshold, hotSalts)
    }
  }

  private[graft] def bandedOf(sigs: DataFrame, idCol: String, k: Int, bands: Int,
                              bucketFamily: (Int, Column) => Column): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    sigs.select(
      col(idCol).as("id"), col("sig"),
      explode(array((0 until bands).map(bnd => struct(
        lit(bnd).as("band"),
        bucketFamily(bnd, concat_ws(",", slice(col("sig"), bnd * r + 1, r)))
          .as("bucket"))): _*))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
  }

  private def candidatePairs(banded: DataFrame, k: Int,
                             hotBucketThreshold: Long, hotSalts: Int): DataFrame =
    hotAwareSelfJoin(banded, Seq("band", "bucket"),
      Seq(("id", "id_a", "id_b"), ("sig", "sig_a", "sig_b")),
      hotBucketThreshold, hotSalts)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => x === y), b => b))
          .cast("double") / lit(k)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")

  /** The un-checkpointed candidate plan — separated so specs can assert
    * on the physical plan (withPersisted's eager localCheckpoint leaves
    * only an ExistingRDD scan visible on the returned frame). */
  private[graft] def minHashLshPlan(sigs: DataFrame, idCol: String,
                 k: Int, bands: Int,
                 bucketFamily: (Int, Column) => Column,
                 hotBucketThreshold: Long, hotSalts: Int): DataFrame =
    candidatePairs(bandedOf(sigs, idCol, k, bands, bucketFamily),
      k, hotBucketThreshold, hotSalts)

  /** Persist the banded signature table bucketed+sorted by
    * (band, bucket) — the corpus-side LSH INDEX for incremental dedup.
    * At 100 TB this is written once per corpus snapshot; every later
    * batch joins against it without the index ever shuffling again. */
  /** The one writer both index paths share — overwrite (snapshot) and
    * append (ingest) MUST keep the identical bucketing spec or appended
    * batches would silently break bucket-locality of later probes. */
  private def writeBandedTable(banded: DataFrame, mode: String,
                               buckets: Int, table: String): Unit = {
    if (mode == "overwrite")
      Scale.resetManagedTable(banded.sparkSession, table)
    banded.write.mode(mode)
      .bucketBy(buckets, "band", "bucket").sortBy("band", "bucket")
      .format("parquet").saveAsTable(table)
  }

  def writeLshIndex(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 3, k: Int = 32,
                    bands: Int = 8,
                    hashFamily: (Int, Column) => Column = xxHashFamily,
                    bucketFamily: (Int, Column) => Column = xxBucketFamily,
                    buckets: Int = 4, table: String = "lsh_index"): Unit =
    writeBandedTable(
      bandedOf(minHashSignatures(docs, idCol, textCol, n, k, hashFamily),
        idCol, k, bands, bucketFamily),
      "overwrite", buckets, table)

  /** Append a batch's banded signatures to an existing [[writeLshIndex]]
    * table (same bucketing spec required) — the ingest half of
    * continuous dedup: once appended, later batches' probes see this
    * batch. The index is a bag: re-appending a replayed batch only
    * re-produces identical candidate pairs, which the probe's
    * dropDuplicates removes (at-least-once semantics). */
  def appendToLshIndex(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 3, k: Int = 32,
                       bands: Int = 8,
                       hashFamily: (Int, Column) => Column = xxHashFamily,
                       bucketFamily: (Int, Column) => Column = xxBucketFamily,
                       buckets: Int = 4, table: String = "lsh_index"): Unit =
    writeBandedTable(
      bandedOf(minHashSignatures(docs, idCol, textCol, n, k, hashFamily),
        idCol, k, bands, bucketFamily),
      "append", buckets, table)

  /** One ingest step: compute the batch's banded signatures ONCE
    * (persisted), append them to the index, then probe the (now
    * batch-inclusive) index — so the returned pairs cover batch-vs-corpus
    * AND within-batch near-dups without re-running the shingle+minhash
    * aggregation for the second leg. The streaming hot path
    * (`Streams.incrementalIngest`) calls this per micro-batch. */
  def ingestAndProbe(newDocs: DataFrame, table: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     n: Int = 3, k: Int = 32, bands: Int = 8,
                     hashFamily: (Int, Column) => Column = xxHashFamily,
                     bucketFamily: (Int, Column) => Column = xxBucketFamily,
                     buckets: Int = 4,
                     broadcastNew: Boolean = true): DataFrame = {
    val spark = newDocs.sparkSession
    val banded = bandedOf(
      minHashSignatures(newDocs, idCol, textCol, n, k, hashFamily),
      idCol, k, bands, bucketFamily)
    Exec.withPersisted(banded) {
      writeBandedTable(banded, "append", buckets, table)
      lshIndexJoinPlan(spark.table(table), banded, k, broadcastNew)
    }
  }

  /** Near-dup candidates of a NEW batch against a persisted
    * [[writeLshIndex]] table: (id_new, id_idx, est_jaccard). The
    * incremental-ingest shape (CCNet-style): the corpus index is read
    * bucket-local — no exchange on the big side, plan-asserted in
    * DedupSpec — and only the (small) new batch shuffles into the
    * index's bucketing. With `broadcastNew` the batch broadcasts instead
    * and NOTHING shuffles — the right plan when the batch is tiny. The
    * batch must use the index's (n, k, bands, families) configuration. */
  def lshAgainstIndex(newDocs: DataFrame, table: String,
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      hashFamily: (Int, Column) => Column = xxHashFamily,
                      bucketFamily: (Int, Column) => Column = xxBucketFamily,
                      broadcastNew: Boolean = false): DataFrame = {
    val spark = newDocs.sparkSession
    val sigs = minHashSignatures(newDocs, idCol, textCol, n, k, hashFamily)
    val newBanded = bandedOf(sigs, idCol, k, bands, bucketFamily)
    Exec.withPersisted(newBanded) {
      lshIndexJoinPlan(spark.table(table), newBanded, k, broadcastNew)
    }
  }

  /** The un-checkpointed index-join plan (plan-assertion hook, like
    * [[minHashLshPlan]]). */
  private[graft] def lshIndexJoinPlan(idx: DataFrame, newBanded: DataFrame,
                                      k: Int, broadcastNew: Boolean): DataFrame = {
    val newSide0 = newBanded.select(col("id").as("id_new"),
      col("sig").as("sig_new"), col("band"), col("bucket"))
    val newSide =
      if (broadcastNew) broadcast(newSide0) else newSide0.hint("merge")
    newSide
      .join(idx.select(col("id").as("id_idx"), col("sig").as("sig_idx"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .filter(col("id_new") =!= col("id_idx"))
      .select(col("id_new"), col("id_idx"),
        (size(filter(zip_with(col("sig_new"), col("sig_idx"),
          (x, y) => x === y), b => b))
          .cast("double") / lit(k)).as("est_jaccard"))
      .dropDuplicates("id_new", "id_idx")
  }

  /** Run `body` with adaptive execution disabled, restoring the previous
    * setting — for eager materializations whose output PARTITIONING must
    * be captured (AQE wraps plans in AdaptiveSparkPlan, which reports
    * UnknownPartitioning until finalized). Caveat: the toggle is
    * session-scoped, so a concurrent query planned on the SAME session
    * inside this window loses AQE for that plan — harmless for
    * correctness, and the window covers only the edge-table
    * materialization; callers running many queries concurrently should
    * hand this operator its own session (`spark.newSession`). */
  private[operators] def withAqeOff[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  /** Skew-aware LSH candidate self-join, shared by the MinHash band join
    * and the SimHash chunk join. `all` is the bucketed row set (one row
    * per (id, key...)); `sideCols` maps each payload column to its
    * (a-side, b-side) name — the first entry's a-side name is the pair
    * id used for salting. Buckets with more than `hotThreshold` members
    * take the salted path: probe side keyed by hash(id) % salts, build
    * side replicated `salts` ways, so each pair still meets at exactly
    * one salt — result-identical, `salts`-way parallelism on the hot
    * keys. The hot set is by construction tiny (one partial-agg count,
    * broadcast-tagged ONCE on the shared frame; callers persist `all` so
    * the tag/filter branches scan a cached table). hotThreshold <= 0 =
    * plain join (AQE skew handling is the first line; PLANS.md round 4). */
  private[graft] def hotAwareSelfJoin(all: DataFrame, keys: Seq[String],
      sideCols: Seq[(String, String, String)], hotThreshold: Long,
      salts: Int): DataFrame = {
    def side(src: DataFrame, pick: ((String, String, String)) => String) =
      src.select(keys.map(col) ++
        sideCols.map(c => col(c._1).as(pick(c))) ++
        (if (src.columns.contains("__hot")) Seq(col("__hot")) else Nil): _*)
    if (hotThreshold <= 0L) side(all, _._2).join(side(all, _._3), keys)
    else {
      val hot = broadcast(all.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") > hotThreshold)
        .select(keys.map(col) :+ lit(true).as("__hot"): _*))
      val tagged = all.join(hot, keys, "left")
      val aT = side(tagged, _._2)
      val bT = side(tagged, _._3)
      val idA = sideCols.head._2
      val cold = aT.filter(col("__hot").isNull).drop("__hot")
        .join(bT.filter(col("__hot").isNull).drop("__hot"), keys)
      val hotPairs = aT.filter(col("__hot").isNotNull).drop("__hot")
        .withColumn("__salt", pmod(xxhash64(col(idA)), lit(salts)).cast("int"))
        .join(bT.filter(col("__hot").isNotNull).drop("__hot")
            .withColumn("__salt", explode(array((0 until salts).map(lit): _*))),
          keys :+ "__salt")
        .drop("__salt")
      cold.unionByName(hotPairs)
    }
  }

  /** SimHash 64-bit fingerprint per document: sum ±1 per bit over token
    * hashes, bit set where the sum is positive. One codegen'd expression
    * per row (SimHash64) — no explode, no shuffle; replaces a 64-column
    * bit-sum aggregate that cost 9 s at sf0.1 with a ~0.3 s narrow pass. */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.functions.VectorExpressions.simHash64(
        filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
        .as("simhash"))

  /** SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ maxHamming.
    * Candidates come from 4 LSH tables (16-bit chunks): two fingerprints
    * within hamming ≤ 3 must agree on at least one 16-bit chunk — an
    * equi-join per chunk, never a cross join. */
  /** @param hotBucketThreshold same skew lever as [[minHashLsh]]'s — a
    *        universally shared 16-bit chunk (e.g. the all-zero chunk of
    *        short docs) is exactly a viral LSH bucket */
  def simHashNearDups(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", maxHamming: Int = 3,
                      hotBucketThreshold: Long = 0L, hotSalts: Int = 16): DataFrame = {
    val fp = simHash(docs, idCol, textCol) // read by both join sides
    Exec.withPersisted(fp) {
    val chunked = fp.select(col(idCol).as("id"), col("simhash"),
      explode(array((0 until 4).map(c => struct(
        lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ck"))): _*))
        .as("cc"))
      .select(col("id"), col("simhash"), col("cc.chunk"), col("cc.ck"))
    hotAwareSelfJoin(chunked, Seq("chunk", "ck"),
        Seq(("id", "id_a", "id_b"), ("simhash", "sh_a", "sh_b")),
        hotBucketThreshold, hotSalts)
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .dropDuplicates("id_a", "id_b")
    }
  }

  /** Oracle-reproducible SimHash variant: per-token bit j (0..63) is the
    * top bit of the first hex nibble of md5("j:" + token); the fingerprint
    * is the array of 64 bits (token-sum of ±1 per bit, positive → 1).
    * 64 md5 calls per token — far slower than the codegen'd SimHash64
    * long, so it runs on slices; it exists to give the LSH+hamming
    * pipeline a cross-engine SQL oracle (the engine default stays
    * [[simHash]]/[[simHashNearDups]], same pipeline shape). */
  def simHashBitsMd5(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")).as("tok"))
    val contrib = toks
      .select(col("id"), explode(sequence(lit(0), lit(63))).as("j"), col("tok"))
      .select(col("id"), col("j"),
        when(substring(md5(concat(col("j").cast("string"), lit(":"), col("tok"))), 1, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1).as("c"))
    contrib.groupBy("id", "j").agg(sum(col("c")).as("s"))
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("s")))),
        x => when(x.getField("s") > 0, 1).otherwise(0)).as("bits"))
  }

  /** Chunk-LSH near-dup pairs over a bit-array fingerprint (the generic
    * form of [[simHashNearDups]]'s packed-long pipeline): candidates agree
    * on ≥1 of the 4 16-bit chunks, exact hamming filters. */
  def simHashNearDupsBits(fp: DataFrame, maxHamming: Int = 3): DataFrame = {
    Exec.withPersisted(fp) {
      val chunked = fp.select(col("id"), col("bits"),
        explode(array((0 until 4).map(c => struct(
          lit(c).as("chunk"),
          concat_ws("", slice(col("bits"), c * 16 + 1, 16)).as("ck"))): _*))
          .as("cc"))
        .select(col("id"), col("bits"), col("cc.chunk"), col("cc.ck"))
      val a = chunked.select(col("id").as("id_a"), col("bits").as("b_a"),
        col("chunk"), col("ck"))
      val b = chunked.select(col("id").as("id_b"), col("bits").as("b_b"),
        col("chunk"), col("ck"))
      a.join(b, Seq("chunk", "ck"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming",
          size(filter(zip_with(col("b_a"), col("b_b"), (x, y) => x =!= y), v => v))
            .cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates("id_a", "id_b")
    }
  }

  /** Connected components over near-duplicate pairs — the step that turns
    * pairwise candidates (MinHash/SimHash/Jaccard output) into duplicate
    * CLUSTERS with one canonical survivor each. Transitive closure matters:
    * A~B and B~C must collapse to one cluster even when A~C was never a
    * candidate pair.
    *
    * Min-label propagation: every id starts as its own label; each round
    * takes the min of its own and its neighbors' labels; fixpoint when no
    * label changes. Each round is ONE Spark job: the previous label rides
    * through the aggregation as `old`, and a long accumulator counts flips
    * while the eager localCheckpoint materializes the round — no separate
    * join+count convergence job. Task retries can only over-count the
    * accumulator, never under-count: a genuinely converged round has zero
    * flipped rows, so retries cannot fake convergence. Scales with |pairs|
    * and converges in O(component diameter) rounds (near-dup clusters are
    * dense and shallow; the 20-round default cap covers diameter-20
    * chains, far beyond observed dup structure).
    *
    * @param failOnMaxIter when the round cap is hit before the fixpoint,
    *        throw (default) instead of silently returning
    *        partially-propagated labels
    * @return (id, component) where component = the minimum id reachable
    *         from `id` through the pair graph */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          failOnMaxIter: Boolean = true): DataFrame = {
    val spark = pairs.sparkSession
    // pre-partition the (static) edge table by the per-round join key —
    // localCheckpoint preserves the partitioning, and the labels side
    // arrives hash-partitioned on id from its aggregation, so every
    // round's edge⋈label join runs WITHOUT re-shuffling the edges (the
    // dominant volume: 2|E| rows vs |V| labels). Only the label-update
    // aggregation still moves edge-count rows, with map-side combine.
    // The checkpoint must be captured with AQE off: an AdaptiveSparkPlan
    // reports UnknownPartitioning at capture time, which would silently
    // re-introduce the per-round edge shuffle (plan-asserted in DedupSpec).
    val edges = withAqeOff(spark) {
      pairs
        .select(col("id_a").as("u"), col("id_b").as("v"))
        .union(pairs.select(col("id_b"), col("id_a")))
        .pipe(__f => __f.repartition(Exec.adaptiveParts(__f), col("v")))
        .localCheckpoint(true)
    }
    // loop at the static frame's size-derived count, so every per-round
    // label frame co-partitions with the edges (Exec.withShuffleParts:
    // a count mismatch makes EnsureRequirements re-shuffle the 2|E|
    // side every round — the exchange this prep exists to avoid)
    Exec.withShuffleParts(spark, edges.rdd.getNumPartitions) {
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    val labelType = labels.schema("label").dataType
    var it = 0
    var changed = true
    while (changed && it < maxIter) {
      val viaNbr = edges.join(labels, edges("v") === labels("id"))
        .select(edges("u").as("id"), col("label"))
      val merged = labels.withColumn("old", col("label"))
        .unionByName(viaNbr.withColumn("old", lit(null).cast(labelType)))
        .groupBy("id")
        // every id has exactly one self row, so max(old) recovers its
        // previous label next to the new min
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      // flip count rides the round's own checkpoint action as a
      // codegen'd Dataset.observe metric (the stronglyConnectedComponents
      // convention) — the previous formulation counted via a row-typed
      // Dataset.map + accumulator, which dragged every |V| row through
      // DeserializeToObject/SerializeFromObject once per round (guide
      // §4: no per-row JVM lambdas in the hot path). Same convergence
      // predicate: old is null (first-reached) or the min moved.
      val obs = org.apache.spark.sql.Observation()
      val updated = Exec.checkpointCut(merged
        .observe(obs, count(when(col("old").isNull ||
          col("label") =!= col("old"), 1)).as("flips"))
        .select("id", "label"))
      // updated is materialized (eager); last round's label blocks are
      // dead — free them so long runs don't stack |V|-sized copies
      Exec.releaseCheckpoint(labels)
      labels = updated
      changed = obs.get("flips").asInstanceOf[Long] > 0L
      it += 1
    }
    if (changed && failOnMaxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds - " +
          "the pair graph has a component with diameter > maxIter; raise " +
          "maxIter (or pass failOnMaxIter=false to accept partial labels)")
    labels.select(col("id"), col("label").as("component"))
    } // withShuffleParts
  }

  /** Connected components by alternating large-star / small-star
    * contraction — the O(log d)-round twin of [[connectedComponents]]
    * for pair graphs with DEEP components. Min-label propagation pays
    * one shuffle round per unit of component diameter: a duplicate
    * CHAIN (A~B~C~… — each doc near only its neighbors, the shape
    * serially-edited boilerplate produces) of depth d costs d rounds.
    * Star contraction roughly halves chain depth per round pair, so the
    * same chain converges in O(log d) rounds:
    *
    *  - large-star: each node points its LARGER neighbors at the
    *    minimum of its closed neighborhood;
    *  - small-star: each node points its smaller-or-self neighborhood
    *    at that neighborhood's minimum.
    *
    * Each phase is one groupBy (per-node min) + one equi-join back on
    * the node — no new shuffle shapes vs label-prop — but unlike
    * label-prop's static edge table, the edge set CONTRACTS toward the
    * fixpoint (every non-root holding exactly one edge to its
    * component's minimum), so late rounds move less data, and deep
    * components need exponentially fewer of them.
    *
    * Fixpoint witness: a round that leaves (|E|, XOR of xxhash64(u,v))
    * both unchanged. Star graphs are fixpoints of both phases, and a
    * signature collision between DIFFERENT consecutive edge sets needs
    * an adversarial graph (equal cardinality AND equal 64-bit hash
    * XOR); DedupSpec additionally property-pins the result ≡
    * [[connectedComponents]] on random graphs and pins an
    * out-of-label-prop-reach chain (depth > maxIter) converging here.
    *
    * Self-pairs (id_a = id_b) carry no connectivity and are dropped; as
    * in [[connectedComponents]], ids appearing only in self-pairs do
    * not reach the output.
    *
    * @return (id, component) for every id in `pairs`, component = the
    *         minimum reachable id — the same contract as
    *         [[connectedComponents]]. */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 16,
                              failOnMaxIter: Boolean = true): DataFrame = {
    // Edges live in canonical DOWN form (u > v), deduped: symmetrizing
    // for a neighborhood pass is then a distinct-free union (the two
    // orientations can't collide), and large-star's raw emissions
    // (v, m) with v > m are ALREADY down-form — small-star consumes
    // them directly. Two distincts per round, not four.
    def sym(down: DataFrame): DataFrame =
      down.union(down.select(col("v").as("u"), col("u").as("v")))

    // large-star: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
    def largeStar(down: DataFrame): DataFrame = {
      val full = sym(down)
      val mins = full.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      full.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: over S = {v ∈ Γ(u): v < u} — in down form exactly
    // this node's rows — m = min(S); emit (u, m) and (v, m) for v ∈ S
    // (the v = m self-row dies in the u ≠ v filter)
    def smallStar(down: DataFrame): DataFrame = {
      val mins = down.groupBy("u").agg(min("v").as("m"))
      down.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // The fixpoint signature rides an Observation on each round's eager
    // checkpoint — the materialization pass computes (|E|, XOR of
    // xxhash64(u,v)) for free instead of a second full scan per round.
    // XOR, not SUM: order-independent over the distinct edge set and
    // can't overflow under ANSI arithmetic.
    val sigCols = Seq(count(lit(1)).as("n"),
      expr("bit_xor(xxhash64(u, v))").as("x"))
    def sigOf(obs: org.apache.spark.sql.Observation): (Long, Long) = {
      val m = obs.get
      (m("n").asInstanceOf[Long],
        Option(m("x")).map(_.asInstanceOf[Long]).getOrElse(0L))
    }

    val obs0 = org.apache.spark.sql.Observation()
    var edges = pairs
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .distinct()
      .observe(obs0, sigCols.head, sigCols.tail: _*)
      .localCheckpoint(true)
    var prev = sigOf(obs0)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prevEdges = edges
      val obs = org.apache.spark.sql.Observation()
      val next = Exec.checkpointCut(smallStar(largeStar(edges))
        .observe(obs, sigCols.head, sigCols.tail: _*))
      // the contracted round is materialized; the previous round's
      // blocks are dead — free them instead of stacking maxIter copies
      Exec.releaseCheckpoint(prevEdges)
      val cur = sigOf(obs)
      converged = cur == prev
      prev = cur
      edges = next
      it += 1
    }
    if (!converged && failOnMaxIter)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter " +
          "rounds - raise maxIter (or pass failOnMaxIter=false to accept " +
          "partial labels)")
    sym(edges).groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("component"))
  }

  /** Cluster-level dedup: one survivor (the minimum id) per connected
    * component of the pair graph; documents with no near-dup pair survive
    * untouched. Anti-join on the non-survivor member set — never touches
    * document bodies. */
  def dedupByComponents(docs: DataFrame, pairs: DataFrame,
                        idCol: String = "doc_id"): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Per near-dup cluster: the member with the highest `scoreCol`
    * (ties → lowest id) plus the cluster size — the QUALITY-AWARE
    * survivor rule production dedup uses instead of min-id (keep the
    * longest / best-scored copy of a duplicated document, not an
    * arbitrary one). Returns (component, survivor_id, n_members);
    * singletons (docs in no pair) are not clusters and don't appear.
    * One max_by hash aggregate over the (cluster-member)-sized label
    * table — never touches document bodies. */
  def componentBest(docs: DataFrame, pairs: DataFrame, scoreCol: String,
                    idCol: String = "doc_id"): DataFrame =
    componentBestFrom(connectedComponents(pairs), docs, scoreCol, idCol)

  private def componentBestFrom(cc: DataFrame, docs: DataFrame,
                                scoreCol: String, idCol: String): DataFrame =
    cc.join(docs.select(col(idCol).as("id"), col(scoreCol).as("__s")), "id")
      .groupBy("component")
      .agg(max_by(col("id"), struct(col("__s"), negate(col("id"))))
        .as("survivor_id"),
        count(lit(1)).as("n_members"))

  /** Cluster-level dedup keeping the BEST-scored member per component
    * (ties → lowest id) — [[dedupByComponents]] with the survivor rule
    * swapped from min-id to max-score. Components are computed once;
    * the anti-join moves only loser ids. */
  def dedupByComponentsBest(docs: DataFrame, pairs: DataFrame,
                            scoreCol: String,
                            idCol: String = "doc_id"): DataFrame = {
    val cc = connectedComponents(pairs)
    val best = componentBestFrom(cc, docs, scoreCol, idCol)
    val losers = cc.join(best, "component")
      .filter(col("id") =!= col("survivor_id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard similarity for all candidate pairs that share at
    * least one shingle (equi-join on shingle, then |∩|/|∪|). Use after LSH
    * at scale; standalone it's exact but shuffles every (doc, shingle).
    *
    * @param hotBucketThreshold same viral-key lever as [[minHashLsh]]'s —
    *        a boilerplate shingle carried by m docs yields m² pair rows in
    *        one task; above the threshold the self-join takes the salted
    *        path (result-identical: each pair still meets exactly once per
    *        shared shingle, so the intersection counts are unchanged).
    *        0 (default) = plain equi-join. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 3,
                        minJaccard: Double = 0.5,
                        hotBucketThreshold: Long = 0L,
                        hotSalts: Int = 16): DataFrame = {
    // read three times (sizes + both join sides) — persist the exploded
    // shingles once, release after the pair result materializes
    val sh = shingleRows(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), col("shingle"))
    Exec.withPersisted(sh) {
      ngramJaccardPairsFromShingles(sh, minJaccard, hotBucketThreshold,
        hotSalts)
    }
  }

  /** [[ngramJaccardPairs]] over an ALREADY-MATERIALIZED (id, shingle)
    * frame — for callers that need the shingle explosion for something
    * else too (e.g. a skew census) and shouldn't pay the corpus pass
    * twice. The caller owns persistence of `sh`. */
  def ngramJaccardPairsFromShingles(sh: DataFrame,
                                    minJaccard: Double = 0.5,
                                    hotBucketThreshold: Long = 0L,
                                    hotSalts: Int = 16): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = hotAwareSelfJoin(sh, Seq("shingle"),
        Seq(("id", "id_a", "id_b")), hotBucketThreshold, hotSalts)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** PREFIX-FILTERED n-gram Jaccard self-join (the PPJoin/AllPairs
    * candidate rule, Bayardo et al. 2007 / Xiao et al. 2008) — the
    * 100 TB face of [[ngramJaccardPairs]], same output exactly
    * (spec-pinned; gate q130).
    *
    * Why the naive join dies at scale: it equi-joins docs on EVERY
    * shared shingle, so one hot shingle (a stopword 3-gram that
    * appears in 10% of a web corpus) alone generates 10⁻²·N²
    * candidate rows. Prefix filtering keeps, per doc, only the
    * `n_sh − ⌈τ·n_sh⌉ + 1` GLOBALLY RAREST shingles (df ASC, shingle
    * ASC — one total order shared by all docs) as join keys: two sets
    * with Jaccard ≥ τ must overlap inside both prefixes (fewer than
    * τ·n matches can only be missing if more than (1−τ)·n prefix
    * slots all miss — pigeonhole), so no true pair is lost, while hot
    * shingles rank LAST in the global order and fall outside nearly
    * every prefix — the skew generator never becomes a join key. A
    * length filter (`min(na,nb) ≥ τ·max(na,nb)`, necessary since
    * jaccard ≤ min/max) prunes cross-size candidates before
    * verification.
    *
    * Verification is per-candidate-pair `array_intersect` over each
    * doc's sorted shingle array (doc-bounded work; candidates after
    * prefix+length filtering are output-sized, not hot-key-sized) —
    * the exact jaccard recomputation means an over-generated
    * candidate can never produce a wrong row, so the float guards
    * below only ever err toward MORE candidates: both ⌈τ·n⌉ and the
    * length filter subtract 1e-9 before ceil/compare, keeping the
    * boundary cases (τ·n exactly integral) on the safe side of IEEE
    * rounding.
    *
    * Shape at 100 TB: one df census (map-side combined), one per-doc
    * window to rank shingles (shuffle on id — the same key as the
    * size census), a self-join whose key distribution is by
    * construction cold, and the verify join on the candidate pair
    * set. */
  def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text", n: Int = 3,
                              minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "minJaccard must be in (0, 1] — prefix filtering needs a real threshold")
    // shingles carry as 64-bit hashes from here on: the candidate join
    // shuffles 8-byte keys instead of ~20-byte strings and the verify's
    // array_intersect compares longs — measured best-of-2 8.46 → 4.08 s
    // on the q130 shape (sf0.1, local[32]). The prefix stays correct
    // under the (df, hash) order — the filter theorem needs only ONE
    // consistent total order on the shingle universe — and distinct
    // shingles stay distinct absent an xxhash64 collision (at
    // billion-shingle corpus scale a collision perturbs one inter
    // count by 1; it cannot merge documents on its own). An INTRA-doc
    // collision would also differ from a raw-string oracle (DuckDB
    // compares the strings themselves), so the set and n_sh below are
    // computed post-dedup: a collision then degrades Jaccard
    // symmetrically (numerator and denominator shift together by 1)
    // instead of skewing only the denominator.
    val sh = shingleRows(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), xxhash64(col("shingle")).as("shingle"))
    val sets = sh.groupBy("id")
      .agg(sort_array(array_distinct(collect_list(col("shingle"))))
        .as("set"))
      .withColumn("n_sh", size(col("set")).cast("long"))
    // ONE withPersisted level for both reused intermediates — nesting
    // two would eagerly checkpoint the final pair table twice
    Exec.withPersisted(sh, sets) {
      val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val prefixLen =
        (col("n_sh") - ceil(col("n_sh") * minJaccard - 1e-9) + 1)
      val prefix = sh.join(df, "shingle")
          .join(sets.select(col("id"), col("n_sh")), "id")
          .withColumn("rn", row_number().over(
            Window.partitionBy("id").orderBy(col("df"), col("shingle"))))
          .filter(col("rn") <= prefixLen)
          .select("id", "shingle", "n_sh")
        val cand = prefix.select(col("id").as("id_a"), col("shingle"),
            col("n_sh").as("na"))
          .join(prefix.select(col("id").as("id_b"), col("shingle"),
            col("n_sh").as("nb")), "shingle")
          .filter(col("id_a") < col("id_b") &&
            least(col("na"), col("nb")).cast("double") >=
              greatest(col("na"), col("nb")) * minJaccard - 1e-9)
          .select("id_a", "id_b").distinct()
        cand
          .join(sets.select(col("id").as("id_a"), col("set").as("__sa"),
            col("n_sh").as("na")), Seq("id_a"))
          .join(sets.select(col("id").as("id_b"), col("set").as("__sb"),
            col("n_sh").as("nb")), Seq("id_b"))
          .withColumn("inter",
            size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
          .withColumn("jaccard",
            col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .filter(col("jaccard") >= minJaccard)
          .select("id_a", "id_b", "jaccard")
    }
  }

  /** Edit-distance similarity join: all id pairs whose strings are
    * within Levenshtein distance `maxDist` — the entity-resolution /
    * typo-dedup primitive next to the token-set families above.
    * Candidate generation is the positional-multiset q-gram count
    * filter: a true pair shares at least
    * `max(len) − q + 1 − maxDist·q` q-gram occurrences (each edit
    * destroys ≤ q grams), counted as a MULTISET via per-(id, gram)
    * occurrence ordinals so repeated grams can't inflate the filter;
    * survivors verify with one `levenshtein` call. The bound only
    * bites when `max(len) ≥ q + maxDist·q`, so pairs where BOTH
    * strings are shorter than that threshold route through a
    * length-bucketed cross join instead (the two paths partition the
    * pair space on max(len) — no pair is double-emitted or missed;
    * strings shorter than q, which have no grams at all, always land
    * in the short bucket because a partner within `maxDist` of their
    * length is short too). Gate q154 equals the NAIVE all-pairs
    * oracle — equality proves no pair lost (the q130 convention).
    *
    * Shape at 100 TB: grams explode to |chars| rows and join on
    * (gram, ordinal) — hot grams salt like any equi-join skew; the
    * count filter collapses candidates with map-side combine BEFORE
    * the string-carrying verify join; the short bucket is a cross
    * join over short-string rows only (at corpus scale short strings
    * exact-dedup first; the honest residual is documented, not
    * hidden). */
  def editDistancePairs(docs: DataFrame, idCol: String = "doc_id",
      strCol: String = "text", maxDist: Int = 2, q: Int = 3): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    require(q >= 2, "q must be >= 2")
    val thresh = q + maxDist * q // gram bound bites at max(len) >= thresh
    val s = docs.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("len", length(col("s")))
    Exec.withPersisted(s) {
      val sh = s.filter(col("len") <= thresh - 1)
      val shortPairs = sh.select(col("id").as("id_a"), col("s").as("sa"),
          col("len").as("la"))
        .join(sh.select(col("id").as("id_b"), col("s").as("sb"),
          col("len").as("lb")),
          col("id_a") < col("id_b") &&
            abs(col("la") - col("lb")) <= maxDist)
      val grams = s.filter(col("len") >= q)
        .select(col("id"), col("len"), posexplode(expr(
          s"transform(sequence(1, length(s) - ${q - 1}), i -> substring(s, i, $q))"))
          .as(Seq("pos", "gram")))
        .withColumn("ord", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id", "gram").orderBy("pos")))
        .select("id", "len", "gram", "ord")
      val cand = grams
        .select(col("id").as("id_a"), col("len").as("la"), col("gram"),
          col("ord"))
        .join(grams.select(col("id").as("id_b"), col("len").as("lb"),
          col("gram"), col("ord")), Seq("gram", "ord"))
        .filter(col("id_a") < col("id_b") &&
          abs(col("la") - col("lb")) <= maxDist &&
          greatest(col("la"), col("lb")) >= thresh)
        .groupBy("id_a", "id_b", "la", "lb")
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >=
          greatest(col("la"), col("lb")) - (q - 1) - maxDist * q)
      val gramPairs = cand
        .join(s.select(col("id").as("id_a"), col("s").as("sa")), "id_a")
        .join(s.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      shortPairs.select(col("id_a"), col("id_b"),
          levenshtein(col("sa"), col("sb")).as("dist"))
        .unionByName(gramPairs.select(col("id_a"), col("id_b"),
          levenshtein(col("sa"), col("sb")).as("dist")))
        .filter(col("dist") <= maxDist)
    }
  }

  /** Containment (asymmetric near-subset) join: DIRECTED doc pairs
    * where |A∩B|/|A| ≥ num/den over word `n`-gram sets — the
    * quote/excerpt detector exact Jaccard can't express (a tweet
    * quoted inside an article has tiny Jaccard but containment ≈ 1).
    * Intersections come from the postings self-join counted per pair
    * (map-side combined — no arrays shipped), the threshold is the
    * cross-multiplied integer test inter·den ≥ na·num, and the one
    * double is the final per-row division. Shape at 100 TB: candidate
    * volume is Σ_shingle df² — `maxDf` (optional) drops
    * hotter-than-boilerplate shingles BEFORE the join, trading
    * bounded recall loss (documented: dropping a shared shingle can
    * only lower inter) for a hard cap on any single join group. */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3,
      num: Int = 4, den: Int = 5,
      maxDf: Option[Long] = None): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      "containment threshold num/den must be in (0, 1]")
    val sh = shingleRows(docs, idCol, textCol, n)
      .select(col(idCol).as("id"), col("shingle"))
    Exec.withPersisted(sh) {
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
      val posting = maxDf match {
        case Some(cap) =>
          val hot = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
            .filter(col("__df") > cap).select("shingle")
          sh.join(hot, Seq("shingle"), "left_anti")
        case None => sh
      }
      posting.select(col("id").as("id_a"), col("shingle"))
        .join(posting.select(col("id").as("id_b"), col("shingle")),
          "shingle")
        .filter(col("id_a") =!= col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("id").as("id_a"), col("n_sh").as("na")),
          "id_a")
        .filter(col("inter") * den >= col("na") * num)
        .join(sizes.select(col("id").as("id_b"), col("n_sh").as("nb")),
          "id_b")
        .select(col("id_a"), col("id_b"), col("inter"), col("na"),
          col("nb"),
          (col("inter").cast("double") / col("na").cast("double"))
            .as("containment"))
    }
  }

  /** Token-weighted cosine similarity join: doc pairs with
    * cos(A, B) = Σc_a·c_b / √(Σc_a²·Σc_b²) ≥ √(t2num/t2den) over word
    * COUNT vectors — the weighted twin of [[ngramJaccardPairsPrefix]]
    * (repeated terms matter: Jaccard treats a word said once and
    * fifty times alike). Dot products fold exactly from the postings
    * self-join (BIGINT), the threshold is the squared cross-multiplied
    * integer test dot²·t2den ≥ na2·nb2·t2num (DECIMAL(38,0) — dot² at
    * corpus scale passes 2^63), and the emitted cosine is one
    * division + one correctly-rounded √ over exact integers. Same
    * Σdf² candidate shape and the same optional `maxDf` hot-token
    * guard as [[containmentPairs]]. */
  def cosineTokenPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3,
      t2num: Int = 9, t2den: Int = 25,
      maxDf: Option[Long] = None): DataFrame = {
    require(t2num >= 1 && t2den >= 1 && t2num <= t2den,
      "squared threshold t2num/t2den must be in (0, 1]")
    require(n >= 1, "n must be >= 1")
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // n-grams WITH multiplicity (no array_distinct — counts are the
    // point); unigrams (n = 1) over this corpus's tiny vocabulary would
    // make every posting list |corpus|-long — n ≥ 2 keeps df bounded
    // by real phrase repetition, which is also the better signal.
    val w = col("__words")
    val tok = docs
      .select(col(idCol).as("id"),
        split(lower(col(textCol)), "\\s+").as("__words"))
      .select(col("id"), explode(filter(
        transform(sequence(lit(0), greatest(size(w) - n, lit(0))),
          i => when(i + n <= size(w),
            concat_ws(" ", slice(w, i + lit(1), lit(n))))),
        x => x.isNotNull)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("id", "token").agg(count(lit(1)).as("c"))
    Exec.withPersisted(tok) {
      val norms = tok.groupBy("id").agg(sum(col("c") * col("c")).as("n2"))
      val posting = maxDf match {
        case Some(cap) =>
          val hot = tok.groupBy("token").agg(count(lit(1)).as("__df"))
            .filter(col("__df") > cap).select("token")
          tok.join(hot, Seq("token"), "left_anti")
        case None => tok
      }
      posting.select(col("id").as("id_a"), col("token"),
          col("c").as("ca"))
        .join(posting.select(col("id").as("id_b"), col("token"),
          col("c").as("cb")), "token")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(sum(col("ca") * col("cb")).as("dot"))
        .join(norms.select(col("id").as("id_a"), col("n2").as("na2")),
          "id_a")
        .join(norms.select(col("id").as("id_b"), col("n2").as("nb2")),
          "id_b")
        .filter(col("dot").cast(d38) * col("dot").cast(d38) * t2den >=
          col("na2").cast(d38) * col("nb2").cast(d38) * t2num)
        .select(col("id_a"), col("id_b"), col("dot"), col("na2"),
          col("nb2"),
          (col("dot").cast("double") /
            sqrt((col("na2") * col("nb2")).cast("double"))).as("cosine"))
    }
  }

  /** Record-linkage Jaro–Winkler pair join: candidate pairs share a
    * `blockLen`-char lowercase prefix block AND sit within `maxLenDiff`
    * of each other in length (both are JW-sound filters in practice —
    * Winkler's boost rewards shared prefixes, and a large length gap
    * caps m/max(la,lb) well below any useful threshold), then the exact
    * codegen'd [[graft.functions.VectorExpressions.jaroWinkler]] kernel
    * scores the survivors. Never all-pairs: the block equi-join carries
    * the quadratic term per block only — at production scale pick
    * `blockLen` (or swap in a phonetic key) so blocks stay bounded, and
    * a viral block takes the [[minHashLsh]] hot-bucket salting path
    * unchanged ([[hotAwareSelfJoin]] applies to any (key, id) shape). */
  def jaroWinklerPairs(docs: DataFrame, idCol: String = "doc_id",
      strCol: String = "text", minSim: Double = 0.9,
      blockLen: Int = 1, maxLenDiff: Int = 4): DataFrame = {
    require(blockLen >= 1, "blockLen must be >= 1")
    require(maxLenDiff >= 0, "maxLenDiff must be >= 0")
    val s = docs.filter(col(strCol).isNotNull)
      .select(col(idCol).as("id"), col(strCol).as("s"),
        lower(substring(col(strCol), 1, blockLen)).as("blk"),
        length(col(strCol)).as("len"))
    s.select(col("id").as("id_a"), col("s").as("sa"), col("blk"),
        col("len").as("la"))
      .join(s.select(col("id").as("id_b"), col("s").as("sb"), col("blk"),
        col("len").as("lb")), Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("la") - col("lb")) <= maxLenDiff)
      .withColumn("jw",
        graft.functions.VectorExpressions.jaroWinkler(col("sa"), col("sb")))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw"))
  }

  /** URL canonicalization — the web-crawl dedup normalizer: drop the
    * fragment, lowercase scheme+host, strip the default :80/:443 port,
    * strip ONE trailing slash from the path, drop utm_ and fbclid
    * tracking params, and sort the surviving query params. Pure string
    * expressions (regex + array ops), codegen-friendly, and every rule
    * replays verbatim in any SQL engine — no UDF, no URI library
    * divergence. Deliberately conservative: no %-decode, no param
    * value normalization (both are site-semantics-dependent). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val path0 = regexp_replace(noFrag, "\\?.*$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val headRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"
    val head0 = lower(regexp_extract(path0, headRe, 0))
    val head = regexp_replace(
      regexp_replace(head0, "^(http://[^:]*):80$", "$1"),
      "^(https://[^:]*):443$", "$1")
    val rest = regexp_replace(
      regexp_replace(path0, headRe, ""), "/$", "")
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid"))
    val sortedQ = array_join(sort_array(params), "&")
    concat(head, rest,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Exact dedup by canonical URL: the census face — one row per
    * canonical form with its duplicate count and min-id survivor (the
    * q15 exact-dedup rule applied to [[canonicalUrl]] keys). One
    * hash groupBy; scales like any exact dedup. */
  def urlDedup(df: DataFrame, urlCol: String,
      idCol: String = "doc_id"): DataFrame =
    df.select(canonicalUrl(col(urlCol)).as("canonical_url"),
        col(idCol).as("__id"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_dups"), min(col("__id")).as("survivor_id"))
}
