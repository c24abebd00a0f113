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
}
