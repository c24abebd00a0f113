package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
