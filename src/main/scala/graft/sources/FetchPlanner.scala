package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Restartable batched-fetch planning (SURVEY.md §2.1 S9, §2.3 J9) —
 * the distributed re-expression of the reference's checkpoint-every-25
 * fetch loop (ExternalApiResultsFetcher.py:193-288): already-fetched keys
 * live in result files; a restart fetches only the anti-join remainder,
 * in bounded batches.
 *
 * The HTTP calls themselves stay out of the engine (zero-egress here);
 * `runBatch` shows the foreachPartition shape a fetcher plugs into.
 */
object FetchPlanner {

  /** Keys still to fetch: left anti-join of the universe against done. */
  def pendingKeys(all: DataFrame, done: DataFrame, keyCol: String): DataFrame =
    all.select(keyCol).distinct()
      .join(done.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** Assign checkpoint batches of `batchSize` keys (reference: 25/dump,
    * UniProt 1000/job). Deterministic: batches follow key order. */
  def batches(pending: DataFrame, keyCol: String, batchSize: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(keyCol))
    pending.withColumn("batch_id",
      ((row_number().over(w) - 1) / batchSize).cast("long"))
  }

  /** Shape of the executor-side fetch: one connection per partition, one
    * request per key, results returned as (key, json) rows. `fetch` is
    * injected (tests use a pure function; production an HTTP client). */
  def runBatch(batch: DataFrame, keyCol: String,
               fetch: String => String): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { keys =>
        // per-partition client setup would go here (rate limiter, session)
        keys.map(k => (k, fetch(k)))
      }
      .toDF(keyCol, "json")
  }
}
