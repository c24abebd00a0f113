package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface (builder mandate; reference has no true
 * streams — its closest analogue is the restartable checkpointed fetch
 * loop, SURVEY.md §2.10).
 *
 *  - `windowedEventCounts`: watermarked sliding-window aggregation over
 *    the events schema — the standard late-data-tolerant stream agg;
 *  - `incrementalTuples`: foreachBatch micro-batch driver that re-runs
 *    the NSForest tuple writer on each new batch of results files — the
 *    streaming re-expression of the reference's "process new result
 *    files as they arrive" batch loop (checkpointing makes it
 *    restartable exactly like ExternalApiResultsFetcher.py:193-288);
 *  - `dedupStream`: stateful exact-dedup with dropDuplicatesWithinWatermark
 *    (bounded state), the streaming face of Dedup.exact.
 */
object Streams {

  /** Watermarked sliding-window count+sum per event_type.
    * @param events streaming DataFrame with (ts timestamp, event_type,
    *               value) */
  def windowedEventCounts(events: DataFrame,
                          watermark: String = "10 minutes",
                          windowLen: String = "5 minutes",
                          slide: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact-dedup on a key column with bounded state. */
  def dedupStream(df: DataFrame, keyCol: String, watermark: String = "1 hour",
                  tsCol: String = "ts"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  final case class SessionEvent(ts: java.sql.Timestamp, event_type: String,
                                value: Double)
  final case class SessionAgg(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class ClosedSession(event_type: String,
                                 win_start: java.sql.Timestamp,
                                 win_end: java.sql.Timestamp,
                                 n: Long, sum_value: Double)

  /**
   * Custom-state sessionization — the `flatMapGroupsWithState` face of
   * the engine (builder mandate): per event_type, events within `gapMs`
   * of each other merge into one session; a session closes (and is
   * emitted, Append mode) when a later event arrives past the gap OR the
   * event-time watermark passes its timeout. State per key is ONE small
   * struct — bounded regardless of stream length; the watermark bounds
   * how long an idle session can linger.
   */
  def sessionize(events: Dataset[SessionEvent],
                 watermark: String = "30 minutes",
                 gapMs: Long = 30L * 60 * 1000): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._

    def close(key: String, s: SessionAgg): ClosedSession =
      ClosedSession(key, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.n, s.sum)

    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[SessionEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(close(key, s))
          } else {
            // fold the batch's events (sorted by event time) into
            // sessions, seeding with the carried state; every session
            // superseded by a gap closes now, the last stays open
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t <= s.endMs + gapMs =>
                  Some(SessionAgg(s.startMs, math.max(s.endMs, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= close(key, s)
                  Some(SessionAgg(t, t, 1, e.value))
                case None => Some(SessionAgg(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /**
   * Built-in `session_window` face of [[sessionize]] — same gap rule,
   * same closed-session rows (win_end = last event, n, sum), expressed
   * as a watermarked native aggregation instead of custom state.
   *
   * Why both exist: [[sessionize]] demonstrates arbitrary-state
   * sessionization (and closes a session the moment a gap-succeeding
   * event arrives); this one is the scale path. The native session
   * aggregation pre-merges sessions map-side in the local partition
   * before the stateful shuffle, so a hot key's micro-batch events
   * reduce to a handful of candidate sessions BEFORE one task sees
   * them — the custom fold instead buffers and sorts the key's whole
   * batch slice in a single group iterator. State-store state is one
   * (start, end, agg) struct per OPEN session, merged by the store.
   *
   * Emission is Append-mode standard: a session emits once the event
   * watermark passes its close (`session_window.end` = last event +
   * gap; the published win_end subtracts the gap back to the last
   * event, pinning the [[sessionize]] schema). StreamsSpec pins the
   * two faces emit identical session sets on the same stream.
   *
   * @param events streaming frame with (ts timestamp, event_type,
   *               value) — [[SessionEvent]]'s shape, untyped
   */
  def sessionizeNative(events: DataFrame,
                       watermark: String = "30 minutes",
                       gapMs: Long = 30L * 60 * 1000): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"),
        s"${gapMs / 1000.0} seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("event_type"),
        col("session_window.start").as("win_start"),
        (col("session_window.end") - make_dt_interval(
          lit(0), lit(0), lit(0), lit(gapMs / 1000.0))).as("win_end"),
        col("n"), col("sum_value"))

  final case class BucketDoc(band: Int, bucket: Long, doc_id: Long,
                             ts: java.sql.Timestamp, sig: Seq[Long])
  final case class BucketState(docs: List[(Long, Seq[Long])], lastMs: Long)
  final case class NearDupPair(id_a: Long, id_b: Long, est_jaccard: Double)

  /**
   * Streaming near-duplicate detection — the streaming face of
   * `Dedup.minHashLsh` for ingest-time dedup of an arriving corpus:
   *
   *  - per-row MinHash signature (NO grouping: shingles via the codegen'd
   *    WordShingles, member j = min over the shingle array of
   *    xxhash64(j, shingle) — identical values to the batch signature);
   *  - explode into (band, bucket) keys exactly like the batch banding;
   *  - `flatMapGroupsWithState` per bucket holds the (id, sig) of docs
   *    seen so far and emits a pair for every new arrival whose estimated
   *    Jaccard (fraction of agreeing members) clears `minJaccard` —
   *    near-dups are found ACROSS micro-batches, not just within one;
   *  - state is bounded two ways: `maxPerBucket` caps a viral bucket's
   *    member list (the streaming twin of the batch hot-bucket lever —
   *    beyond the cap new docs still match against the retained members
   *    but are not added), and the event-time timeout drops buckets idle
   *    past the watermark + `idleTtlMs`.
   *
   * A pair sharing several bands can be emitted once per band (streaming
   * Append mode cannot re-aggregate emitted rows); downstream exact
   * consumers dedup on (id_a, id_b).
   *
   * @param docs streaming Dataset of (doc_id, ts, text)
   */
  def streamingNearDups(docs: DataFrame, n: Int = 3, k: Int = 16,
                        bands: Int = 4, minJaccard: Double = 0.5,
                        watermark: String = "1 hour",
                        idleTtlMs: Long = 60L * 60 * 1000,
                        maxPerBucket: Int = 64): Dataset[NearDupPair] = {
    require(k % bands == 0, "bands must divide k")
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    val shingles = graft.functions.VectorExpressions
      .wordShingles(split(lower(col("text")), "\\s+"), n)
    val sig = array((0 until k).map(j =>
      array_min(transform(shingles, sh => xxhash64(lit(j), sh)))): _*)
    val banded = docs
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"), col("sig"),
        explode(array((0 until bands).map(bnd => struct(
          lit(bnd).as("band"),
          // long bucket key: hash of the band's signature slice
          xxhash64(lit(bnd) +: (bnd * r until (bnd + 1) * r)
            .map(col("sig")(_)): _*).as("bucket"))): _*)).as("bb"))
      .select(col("bb.band"), col("bb.bucket"), col("doc_id"), col("ts"),
        col("sig"))
      .as[BucketDoc]

    def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).count { case (x, y) => x == y }.toDouble / k

    banded
      .withWatermark("ts", watermark)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), it: Iterator[BucketDoc], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(BucketState(Nil, 0L))
            val out = List.newBuilder[NearDupPair]
            it.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              st.docs.foreach { case (seenId, seenSig) =>
                if (seenId != d.doc_id) {
                  val est = estJaccard(seenSig, d.sig)
                  if (est >= minJaccard)
                    out += NearDupPair(math.min(seenId, d.doc_id),
                      math.max(seenId, d.doc_id), est)
                }
              }
              if (st.docs.size < maxPerBucket &&
                  !st.docs.exists(_._1 == d.doc_id))
                st = BucketState((d.doc_id, d.sig) :: st.docs,
                  math.max(st.lastMs, d.ts.getTime))
              else st = st.copy(lastMs = math.max(st.lastMs, d.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + idleTtlMs)
            out.result().iterator
          }
      }
  }

  /** Continuous-ingest dedup: every micro-batch APPENDS its banded
    * MinHash signatures to the persisted LSH index, then probes the
    * index (which now includes the batch itself), so the emitted pair
    * set covers batch-vs-corpus AND within-batch near-dups — over a full
    * run it equals the batch operator's pair set on the accumulated
    * corpus (spec-pinned). Pairs are canonicalized (id_a < id_b) and
    * appended to `pairsPath` as parquet. The index side of the probe
    * never shuffles (DedupSpec plan assertion); the batch side
    * broadcasts. Restart semantics are at-least-once: a replayed batch
    * re-appends signatures (the index is a bag — duplicates only
    * re-produce identical pairs) and re-emits the same pair rows, so
    * downstream readers dedup on (id_a, id_b). */
  def incrementalIngest(docs: DataFrame, table: String, pairsPath: String,
                        checkpoint: String, n: Int = 3, k: Int = 32,
                        bands: Int = 8, buckets: Int = 4)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // one signature computation per batch: append + probe share the
        // persisted banded frame (ingestAndProbe)
        graft.operators.Dedup.ingestAndProbe(batch, table,
            n = n, k = k, bands = bands, buckets = buckets)
          .select(
            least(col("id_new"), col("id_idx")).as("id_a"),
            greatest(col("id_new"), col("id_idx")).as("id_b"),
            col("est_jaccard"))
          .dropDuplicates("id_a", "id_b")
          .write.mode("append").parquet(pairsPath)
        ()
      }
      .start()

  /** Continuous ANN ingest — the IVF twin of [[incrementalIngest]]:
    * every micro-batch of (id, embedding) rows takes the narrow
    * nearest-centroid assignment against the frozen quantizer and lands
    * under the index root. EFFECTIVELY EXACTLY-ONCE: each batch writes
    * its own `batch=<id>` partition directory with mode overwrite, so a
    * replayed batch (crash between the parquet commit and the streaming
    * checkpoint commit) REPLACES its previous attempt instead of
    * appending duplicate rows — duplicates would silently corrupt ANN
    * top-k (the same nbr_id filling two of the k slots), unlike the LSH
    * twin whose duplicate pairs downstream dedup absorbs. Probes read
    * the root as usual: `batch` is just an extra partition column and
    * cell_id partition pruning still applies within every batch dir.
    *
    * Layout contract: this sink OWNS its root — the nested
    * `batch=/cell_id=` layout cannot mix with a flat
    * `Similarity.writeIvfIndex` directory (Spark partition discovery
    * rejects mixed depths), so seed any pre-existing base corpus
    * through the stream (or keep base and stream under separate roots
    * and union at probe time). Enforced at start. Replay caveat: while
    * a replayed batch is being re-written, a concurrent probe can
    * transiently miss that one batch directory (the old append-mode
    * alternative never removed files but duplicated rows instead —
    * wrong answers beat a transient miss). Checkpoint-continuity
    * invariant: one ingest root ↔ one checkpoint lineage — a reset
    * checkpoint (or a second query on the same root) restarts batchId
    * at 0 and overwrites live batch dirs (see
    * [[incrementalHierPqIngest]] for the full statement). */
  def incrementalVectorIngest(vecs: DataFrame,
                              centroids: Seq[(Int, Array[Float])],
                              indexPath: String, checkpoint: String,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding")
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val conf = vecs.sparkSession.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = rootPath.getFileSystem(conf)
    if (fs.exists(rootPath)) {
      val foreign = fs.listStatus(rootPath).map(_.getPath.getName)
        .filterNot(n => n.startsWith("batch=") || n.startsWith("_") ||
          n.startsWith("."))
      require(foreign.isEmpty,
        s"incrementalVectorIngest owns its root; $indexPath already holds " +
          s"non-batch entries (${foreign.take(3).mkString(", ")}) - a flat " +
          "writeIvfIndex layout cannot mix with the batch= layout")
    }
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.assignCells(
            batch.select(org.apache.spark.sql.functions.col(idCol).as("nbr_id"),
              org.apache.spark.sql.functions.col(vecCol).as("nbr_vec")),
            centroids, "nbr_vec", 1)
          .write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$indexPath/batch=$batchId")
        ()
      }
      .start()
  }

  /**
   * Streaming ingest into a persisted IVF-PQ index
   * (`Similarity.writeIvfPqIndex` layout with a `batch=` level, like
   * [[incrementalVectorIngest]]'s): each micro-batch assigns its
   * vectors to their frozen coarse cell, PQ-encodes them against the
   * frozen codebooks, and overwrites its own `batch=<id>` directory —
   * replayed batches replace, never duplicate, so the ingest is
   * exactly-once on top of at-least-once delivery. Readers prune on
   * cell_id exactly as with the batch-built index.
   * Checkpoint-continuity invariant: one ingest root ↔ one checkpoint
   * lineage (see [[incrementalHierPqIngest]]).
   */
  def incrementalPqIngest(vecs: DataFrame,
                          centroids: Seq[(Int, Array[Float])],
                          cb: graft.operators.Similarity.PqCodebooks,
                          indexPath: String, checkpoint: String,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding")
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val conf = vecs.sparkSession.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = rootPath.getFileSystem(conf)
    if (fs.exists(rootPath)) {
      val foreign = fs.listStatus(rootPath).map(_.getPath.getName)
        .filterNot(n => n.startsWith("batch=") || n.startsWith("_") ||
          n.startsWith("."))
      require(foreign.isEmpty,
        s"incrementalPqIngest owns its root; $indexPath already holds " +
          s"non-batch entries (${foreign.take(3).mkString(", ")}) - a flat " +
          "writeIvfPqIndex layout cannot mix with the batch= layout")
    }
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col => c}
        graft.operators.Similarity.assignCells(
            batch.select(c(idCol).as("nbr_id"), c(vecCol).as("nbr_vec")),
            centroids, "nbr_vec", 1)
          .select(c("nbr_id"),
            graft.operators.Similarity.pqEncode(c("nbr_vec"), cb).as("codes"),
            c("cell_id"))
          .write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$indexPath/batch=$batchId")
        ()
      }
      .start()
  }

  /**
   * Streaming ingest into a persisted TWO-LEVEL IVF-PQ index — the
   * Structured Streaming twin of `Similarity.appendToIvfPqIndexHier`
   * and the production shape of continuous ANN at scale: each
   * micro-batch assigns its vectors through the FROZEN
   * [[graft.operators.Similarity.HierQuantizer]] (~2·√nCells cosines
   * per row, narrow), PQ-encodes against the frozen codebooks, and
   * overwrites its own `batch=<id>` directory — replayed batches
   * replace, never duplicate, so the ingest is exactly-once on top of
   * at-least-once delivery (the [[incrementalPqIngest]] layout
   * contract: this root holds ONLY batch= entries). Readers prune on
   * cell_id exactly as with the refresh-built index (cell_id stays a
   * partition column under the batch level);
   * `Similarity.queryLiveIvfPqIndexHier` probes this root together
   * with the committed version as one index AND masks live tombstones
   * automatically — prefer it for serving. A raw
   * `Similarity.queryIvfPqIndexHierPaths` over the same roots masks
   * NOTHING unless the caller passes
   * `tombstones = Similarity.readTombstoneIds(root)` (r11 ADVICE: the
   * delete contract promises masking in every root, so path-based
   * probes must wire the hook or use the live entry point).
   *
   * Restart semantics: foreachBatch is at-least-once — a crash between
   * the batch write and the checkpoint commit replays that batchId,
   * and the `mode("overwrite")` of the SAME directory makes the replay
   * idempotent. If a compaction folded AND retired the dir in that
   * window, the replay recreates it with rows the committed version
   * already holds — the compactor's `v<n>/folded` manifest guard
   * recognizes it as inherited and retires it again WITHOUT
   * re-folding, so the duplication stays transient (probe-visible only
   * until the next compaction), never baked into a version.
   *
   * CHECKPOINT-CONTINUITY INVARIANT (r12 ADVICE): batch directory
   * names come from Structured Streaming's `batchId`, which is
   * monotonic only WITHIN one checkpoint lineage — deleting/resetting
   * the checkpoint dir, or pointing a SECOND query at the same
   * `indexPath`, restarts ids at 0 and can land genuinely NEW data in
   * a `batch=` id the compactor's ledger already folded. The ledger
   * records each folded dir's id-multiset fingerprint, so the
   * compactor detects the reuse and fails loudly instead of silently
   * deleting the new rows — but the invariant to OPERATE by is: one
   * ingest root ↔ one checkpoint lineage, forever. To retire a stream,
   * drain (compact) its root before starting a successor with a fresh
   * checkpoint.
   */
  def incrementalHierPqIngest(vecs: DataFrame,
                              hq: graft.operators.Similarity.HierQuantizer,
                              cb: graft.operators.Similarity.PqCodebooks,
                              indexPath: String, checkpoint: String,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding")
  : org.apache.spark.sql.streaming.StreamingQuery = {
    val conf = vecs.sparkSession.sparkContext.hadoopConfiguration
    val rootPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = rootPath.getFileSystem(conf)
    if (fs.exists(rootPath)) {
      val foreign = fs.listStatus(rootPath).map(_.getPath.getName)
        .filterNot(n => n.startsWith("batch=") || n.startsWith("_") ||
          n.startsWith("."))
      require(foreign.isEmpty,
        s"incrementalHierPqIngest owns its root; $indexPath already holds " +
          s"non-batch entries (${foreign.take(3).mkString(", ")}) - a flat " +
          "cells layout cannot mix with the batch= layout")
    }
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.{col => c}
        graft.operators.Similarity.assignCellsHier(
            batch.select(c(idCol).as("nbr_id"), c(vecCol).as("nbr_vec")),
            hq, "nbr_vec")
          .select(c("nbr_id"),
            graft.operators.Similarity.pqEncode(c("nbr_vec"), cb).as("codes"),
            c("cell_id"))
          .write.mode("overwrite").partitionBy("cell_id")
          .parquet(s"$indexPath/batch=$batchId")
        ()
      }
      .start()
  }

  /** foreachBatch incremental tuple writing: every micro-batch of NSForest
    * results rows is pushed through the writer and appended to `outPath`
    * as parquet. Restartable via the checkpoint dir. */
  def incrementalTuples(results: DataFrame, datasetVersionIds: Seq[String],
                        outPath: String, checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    results.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.writers.NSForestWriter.tuples(batch, datasetVersionIds, withOrd = false)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** Streaming twin of `Corpus.removeLines`: scrub a FROZEN hot-line
    * set (a persisted `Corpus.boilerplateLines` table built from the
    * historical corpus — the same frozen-reference shape as
    * [[incrementalIngest]]'s LSH index) from documents as they arrive.
    * Entirely STATELESS: the scrub is one per-row expression — the hot
    * set rides the plan as an `In`/`InSet` literal (tiny by nature: a
    * line must repeat across minDocs docs to enter) — so it works in
    * any output mode with no state store, and the spec pins it
    * emit-identical to the batch face on the same hot set. */
  def removeBoilerplateStream(docs: DataFrame, hotLines: Seq[String],
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame =
    if (hotLines.isEmpty) docs.select(col(idCol), col(textCol))
    else docs.select(col(idCol),
      array_join(filter(split(col(textCol), "\n"),
        l => !l.isin(hotLines: _*)), "\n").as(textCol))

  /** Streaming twin of `Corpus.maskDuplicateSpans`: scrub a FROZEN
    * duplicated-span set (xxhash64 of every corpus-repeated n-token
    * window, built once from history via `Corpus.duplicateSpanHashes`)
    * from documents as they arrive — the exact-substring-dedup analogue
    * of [[removeBoilerplateStream]]. Entirely STATELESS (one per-row
    * expression chain, hot set as a plan literal), so it works in any
    * output mode with no state store; spec-pinned row-identical to the
    * batch face on the corpus the set was computed from. */
  def maskSpansStream(docs: DataFrame, hotSpanHashes: Seq[Long],
                      idCol: String = "doc_id", textCol: String = "text",
                      n: Int = 8): DataFrame =
    graft.operators.Corpus.maskSpansAgainst(docs, hotSpanHashes, idCol,
      textCol, n)

  /** One micro-batch of the BM25 ingest, replay-guarded: a batch id
    * at-or-below the high-water mark is a completed replay and becomes a
    * no-op (the standard foreachBatch idempotence pattern —
    * `appendToBm25View` itself is NOT idempotent, a re-applied batch
    * would double-count df). The batch id records LAST, after all three
    * view tables apply, so only a crash INSIDE the three-table apply can
    * replay a partial batch — the same window every non-transactional
    * multi-table sink has; the vector twin ([[incrementalPqIngest]])
    * closes it with per-batch overwrite partitions, which a bucketed
    * saveAsTable cannot express. */
  private[graft] def applyBm25Batch(batch: DataFrame, batchId: Long,
                                    table: String, buckets: Int,
                                    idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val guard = s"${table}_ingest_meta"
    val applied = spark.catalog.tableExists(guard) &&
      !spark.table(guard).filter(col("batch_id") === batchId).isEmpty
    if (!applied && !batch.isEmpty) {
      graft.operators.SearchIndex.appendToBm25View(batch, table, buckets,
        idCol, textCol)
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").format("parquet").saveAsTable(guard)
    }
  }

  /** Continuous BM25 view maintenance — the ranked-retrieval twin of
    * [[incrementalIngest]]: each micro-batch of new documents folds into
    * an existing [[graft.operators.SearchIndex.createBm25View]] through
    * the monoid append path (postings append-only, vocabulary-sized df
    * rewrite, meta re-derive). Seed the view first (an empty corpus is a
    * valid seed); probes via `bm25Query` see each batch as soon as it
    * lands. Replay-guarded per batch (see [[applyBm25Batch]]). */
  def incrementalBm25Ingest(docs: DataFrame, table: String,
                            checkpoint: String, buckets: Int = 16,
                            idCol: String = "doc_id",
                            textCol: String = "text")
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBm25Batch(batch, batchId, table, buckets, idCol, textCol)
      }
      .start()

  private[graft] def applyCooccurBatch(batch: DataFrame, batchId: Long,
      table: String, window: Int, idCol: String,
      textCol: String): Unit = {
    val spark = batch.sparkSession
    val guard = s"${table}_ingest_meta"
    val applied = spark.catalog.tableExists(guard) &&
      !spark.table(guard).filter(col("batch_id") === batchId).isEmpty
    if (!applied && !batch.isEmpty) {
      val add = graft.operators.Corpus.cooccurrencePairs(batch, idCol,
        textCol, window)
      // materialize the merge BEFORE the overwrite drops the table it
      // reads (the appendToBm25View discipline)
      val merged = (if (spark.catalog.tableExists(table))
          spark.table(table).unionByName(add)
            .groupBy("w1", "w2").agg(sum("n").as("n"))
        else add).localCheckpoint(true)
      merged.write.mode("overwrite").format("parquet").saveAsTable(table)
      spark.range(1).select(lit(batchId).as("batch_id"))
        .write.mode("append").format("parquet").saveAsTable(guard)
    }
  }

  /** Continuous co-occurrence-matrix maintenance — the GloVe-corpus
    * twin of [[incrementalBm25Ingest]]: each micro-batch's pair counts
    * (a pure count monoid, [[graft.operators.Corpus
    * .cooccurrencePairs]]) fold into the running table by a
    * vocabulary-pair-sized merge-overwrite. Replay-guarded per batch
    * (the batch-id high-water convention), so redelivery after a
    * restart is a no-op — the spec pins streamed-final ≡ the one-shot
    * batch face and replays a batch to prove it. */
  def incrementalCooccurIngest(docs: DataFrame, table: String,
      checkpoint: String, window: Int = 3, idCol: String = "doc_id",
      textCol: String = "text")
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyCooccurBatch(batch, batchId, table, window, idCol, textCol)
      }
      .start()

  /** Stream-stream interval join — the ad-attribution shape: each
    * arriving purchase matches every click by the same user in the
    * PRECEDING `withinSeconds` (inclusive both ends, the batch
    * `Events.rangeJoin` convention). Both sides carry event-time
    * watermarks, and the interval condition gives Spark the state
    * bound it needs: a buffered click is evicted once the purchase
    * watermark passes `click.ts + within`, a buffered purchase once
    * the click watermark passes `purchase.ts` — so state holds only
    * the active window per side, never the full history. Append-mode
    * output (matches emit when both watermarks allow no more joins).
    *
    * The batch twin is `Events.rangeJoin(points=purchases,
    * intervals=[click.ts, click.ts+within])` — spec-pinned
    * emit-identical on a replayed stream. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      withinSeconds: Long,
                      userCol: String = "user_id", tsCol: String = "ts",
                      purchaseIdCol: String = "event_id",
                      clickIdCol: String = "click_id",
                      watermark: String = "10 minutes"): DataFrame = {
    require(withinSeconds > 0, "attribution window must be positive")
    val p = purchases.select(col(userCol).as("user_id"),
        col(tsCol).as("p_ts"), col(purchaseIdCol).as("purchase_id"))
      .withWatermark("p_ts", watermark)
    val c = clicks.select(col(userCol).as("__c_user"),
        col(tsCol).as("c_ts"), col(clickIdCol).as("click_id"))
      .withWatermark("c_ts", watermark)
    p.join(c, col("user_id") === col("__c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $withinSeconds SECONDS") &&
        col("c_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"))
  }

  final case class CdcEvent(key: String, version: Long, deleted: Boolean,
                            payload: String)
  final case class CdcState(version: Long, deleted: Boolean,
                            payload: String)

  /**
   * Streaming CDC upsert — the continuous face of
   * [[graft.operators.Merge.mergeLatest]] (gate q92): a change stream of
   * (key, version, tombstone, payload) rows folds into per-key
   * latest-wins state, and each micro-batch emits the CURRENT winner for
   * every key it touched (Update mode — the shape an upsert sink like a
   * key-value store or a MERGE-capable table consumes; tombstoned
   * winners emit with `deleted = true` so the sink can propagate the
   * delete). Spec-pinned: replaying any prefix of the stream and
   * snapshotting the last emit per key EQUALS the batch `mergeLatest`
   * over the same rows, and replaying a row is a no-op (idempotent, the
   * CDC replay contract).
   *
   * Same precondition as the batch face: (key, version) unique in the
   * stream — an arriving version ≥ the state's wins (equality = the
   * replayed-correction convention).
   *
   * Shape at 100 TB: state per key is ONE small struct (bounded by the
   * live key set, not the stream length); each trigger shuffles only the
   * batch's rows to their key partitions. The payload is carried as an
   * opaque string — production would encode the row (JSON/Avro) or
   * specialize the case class per schema.
   */
  final case class CusumEvent(key: Long, ord: Long, ord2: Long,
      value: Long)
  final case class CusumState(s: Long, maxS: Long, n: Long,
      firstAlarm: Long)
  final case class CusumStat(key: Long, n: Long, max_cusum: Long,
      first_alarm: Option[Long])

  /** Streaming CUSUM change detection — the stateful twin of
    * `Stats.cusumAlarms`: per key, the clamped recursion
    * S = max(0, S + (x − target)) folds into ONE small state struct,
    * and each micro-batch emits the key's CURRENT (n, max, first-alarm)
    * summary (Update mode — a monitoring sink upserts it). The batch's
    * group buffer is sorted by (ord, ord2) before folding; ACROSS
    * batches the ingest contract is nondecreasing ord per key (the
    * same source-ordering assumption every stateful sequence operator
    * here makes — a violated contract surfaces as a loud error, never
    * a silent wrong fold).
    *
    * Spec-pinned: replaying any prefix and keeping the last emit per
    * key EQUALS the batch face over the same rows.
    *
    * Shape at 100 TB: state is four longs per live key; each trigger
    * shuffles only its own rows. */
  def cusumAlarmStream(events: Dataset[CusumEvent], target: Long,
      threshold: Long): Dataset[CusumStat] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumStat](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[CusumEvent], state: GroupState[CusumState]) =>
          val sorted = it.toArray.sortBy(e => (e.ord, e.ord2))
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, -1L))
          for (e <- sorted) {
            val s = math.max(0L, st.s + (e.value - target))
            st = CusumState(s, math.max(st.maxS, s), st.n + 1,
              if (st.firstAlarm < 0 && s >= threshold) st.n + 1
              else st.firstAlarm)
          }
          state.update(st)
          Iterator.single(CusumStat(key, st.n, st.maxS,
            if (st.firstAlarm < 0) None else Some(st.firstAlarm)))
      }
  }

  def cdcUpsertStream(events: Dataset[CdcEvent]): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CdcEvent], state: GroupState[CdcState]) =>
          val best = it.foldLeft(state.getOption) { (acc, e) =>
            if (acc.forall(e.version >= _.version))
              Some(CdcState(e.version, e.deleted, e.payload))
            else acc
          }
          best match {
            case Some(s) =>
              state.update(s)
              Iterator.single(CdcEvent(key, s.version, s.deleted, s.payload))
            case None => Iterator.empty
          }
      }
  }

  final case class DecayEvent(key: Long, value: Long)
  final case class DecayState(n: Long, score: Double)
  final case class DecayScore(key: Long, n_batches: Long, score: Double)

  /** Streaming dyadic decay score — the stateful twin of
    * `Events.ewmaDyadic` over the per-trigger series: each micro-batch
    * folds its integer sum x for the key and halves history,
    * score = (x + score_prev)·0.5 (first batch seeds score = x). With
    * α = 1/2 every update is a halving of exact dyadic values, so an
    * arbitrary batch boundary placement replays bit-for-bit — the
    * spec pins stream-final state ≡ the batch face on the batch-sum
    * series. State is two fields per live key; each trigger shuffles
    * only its own rows (the trending-score / rate-limiter shape). */
  def decayScoreStream(events: Dataset[DecayEvent]): Dataset[DecayScore] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DecayState, DecayScore](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[DecayEvent], state: GroupState[DecayState]) =>
          var x = 0L
          for (e <- it) x += e.value
          val st = state.getOption.getOrElse(DecayState(0L, 0.0))
          val next =
            if (st.n == 0L) DecayState(1L, x.toDouble)
            else DecayState(st.n + 1L, (x.toDouble + st.score) * 0.5)
          state.update(next)
          Iterator.single(DecayScore(key, next.n, next.score))
      }
  }

  final case class TwapEvent(key: Long, us: Long, eventId: Long, v: Long)
  final case class TwapState(lastUs: Long, lastV: Long, minUs: Long,
      cnt: Long, numStr: String)
  final case class TwapRow(key: Long, n: Long, span_us: Long,
      twap: Option[Double])

  /** Streaming twin of `Events.timeWeightedAvg`: per key the state is
    * the predecessor observation plus the running Σv·Δt numerator —
    * carried as a BigInteger STRING so the exact-decimal contract of
    * the batch face survives unbounded streams (a Long numerator
    * overflows at corpus scale; a Double would break ≡). Each update
    * emits the key's running (n, span, twap) with twap ONE division
    * of the exact numerator, identical to the batch face on the same
    * prefix. Same ordered-feed contract as the debounce twin. */
  def twapStream(events: Dataset[TwapEvent]): Dataset[TwapRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[TwapState, TwapRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[TwapEvent], state: GroupState[TwapState]) =>
          val sorted = it.toArray.sortBy(e => (e.us, e.eventId))
          var st = state.getOption.orNull
          var num = if (st == null) BigInt(0) else BigInt(st.numStr)
          for (e <- sorted) {
            if (st != null) num += BigInt(st.lastV) * (e.us - st.lastUs)
            val mn = if (st == null) e.us else st.minUs
            val c = if (st == null) 1L else st.cnt + 1L
            st = TwapState(e.us, e.v, mn, c, num.toString)
          }
          if (st != null) {
            state.update(st)
            val span = st.lastUs - st.minUs
            // the batch face's exact chain: correctly-rounded double of
            // the exact numerator, ONE IEEE division
            val twap = if (span > 0)
              Some(num.toDouble / span.toDouble)
            else None
            Iterator.single(TwapRow(key, st.cnt, span, twap))
          } else Iterator.empty
      }
  }

  final case class DebounceEvent(key: String, us: Long, eventId: Long)
  final case class DebounceState(lastUs: Long, lastId: Long)

  /** Streaming twin of `Events.debounce` (the memoryless gap rule: an
    * event survives iff it opens a ≥window gap from its PREDECESSOR,
    * kept or not). State per key is just the predecessor's (us, tie) —
    * each micro-batch sorts its own rows by (us, eventId), filters
    * against the rolling predecessor, and leaves the state at the
    * batch's last event. The spec pins the streamed survivor set ≡ the
    * batch face under arbitrary batch boundary placement, PROVIDED
    * batches arrive in event-time order per key (the same contract the
    * sessionize twin documents; out-of-order feeds take a watermark
    * sort upstream). */
  def debounceStream(events: Dataset[DebounceEvent],
      windowSeconds: Long): Dataset[DebounceEvent] = {
    require(windowSeconds > 0, "window must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val winUs = windowSeconds * 1000000L
    events.groupByKey(_.key)
      .flatMapGroupsWithState[DebounceState, DebounceEvent](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[DebounceEvent],
            state: GroupState[DebounceState]) =>
          val sorted = it.toArray.sortBy(e => (e.us, e.eventId))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer[DebounceEvent]()
          for (e <- sorted) {
            if (st == null || e.us - st.lastUs >= winUs) out += e
            st = DebounceState(e.us, e.eventId)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }
}
