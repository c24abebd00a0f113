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

  /** The checkpointed done-set: (key, json, ok) parquet under `dir`, or
    * an empty frame when no dump has happened yet (first run / `force`
    * in the reference is "delete the dir"). */
  def loadCheckpoint(spark: org.apache.spark.sql.SparkSession,
                     dir: String, keyCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.parquet(dir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keyCol,
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("json",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("ok",
            org.apache.spark.sql.types.BooleanType))))
  }

  /** Restartable checkpointed fetch loop — the whole reference dump
    * cycle (ExternalApiResultsFetcher.py:193-288) as one driver loop:
    * load the done-set, anti-join to the pending remainder, fetch in
    * deterministic key-ordered batches of `batchSize` (the reference's
    * 25/dump), APPEND each finished batch to the parquet checkpoint, and
    * return the full done-set. A killed run (maxBatches caps how many
    * batches this invocation executes — the test's kill switch; a real
    * crash is the same thing) restarts by re-invoking: the anti-join
    * resumes at exactly the un-checkpointed keys. A failed fetch
    * checkpoints a placeholder row (`ok = false`, `json = "{}"`) — the
    * reference's empty-dict assignment — so it is recorded, surfaced,
    * and never refetched.
    *
    * `mkFetch` is a per-partition factory (one HTTP client / rate
    * limiter per partition, built executor-side); the fetches in one
    * batch run in parallel across the batch's partitions. Scale shape:
    * the key universe is small relative to data (thousands–millions of
    * API keys) and the wall-clock is fetch-bound, so the one
    * driver-side loop over batch ids and the row_number() batch
    * assignment (one single-partition window over pending KEYS only)
    * are deliberate — correctness of the resume matters more than
    * shuffle count here. */
  def fetchLoop(all: DataFrame, keyCol: String, checkpointDir: String,
                batchSize: Int, mkFetch: () => String => Option[String],
                maxBatches: Int = Int.MaxValue): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    val spark = all.sparkSession
    import spark.implicits._
    val done = loadCheckpoint(spark, checkpointDir, keyCol)
    val pending = batches(pendingKeys(all, done, keyCol), keyCol, batchSize)
      .select(col(keyCol).cast("string").as("__k"), col("batch_id"))
      .localCheckpoint(true) // pin the batch assignment across the loop
    val nBatches = pending.agg(max("batch_id")).as[Option[Long]]
      .head().map(_ + 1L).getOrElse(0L)
    // batch-id assignment rode a single-partition window, so the batch
    // would otherwise fetch on ONE thread — spread it (25 keys per
    // partition, the reference's per-connection batch shape, capped at
    // the cluster's parallelism) so the per-partition clients actually
    // run concurrently
    val fetchParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, batchSize / 25))
    var i = 0L
    while (i < math.min(nBatches, maxBatches.toLong)) {
      val fetched = pending.filter(col("batch_id") === i)
        .select("__k").as[String]
        .repartition(fetchParts)
        .mapPartitions { keys =>
          val fetch = mkFetch() // one client per partition
          keys.map { k =>
            fetch(k) match {
              case Some(json) => (k, json, true)
              case None       => (k, "{}", false) // recorded, not refetched
            }
          }
        }
        .toDF(keyCol, "json", "ok")
      fetched.write.mode("append").parquet(checkpointDir)
      i += 1
    }
    pending.unpersist()
    loadCheckpoint(spark, checkpointDir, keyCol)
  }

  /** JDK-only HTTP GET fetcher factory for [[fetchLoop]]: ONE
    * `java.net.http.HttpClient` per partition (the per-partition client
    * the reference's per-request `requests.post` never amortizes).
    * Non-200 and transport errors map to None → the placeholder row. */
  def httpFetcher(urlFor: String => String,
                  timeoutMs: Int = 10000): () => String => Option[String] =
    () => {
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .build()
      (k: String) => {
        // broad catch mirrors the reference's except-all: an uncaught
        // throw would fail the task and Spark's retry would RE-FETCH
        // every key in the partition — double-sending to a
        // non-idempotent upstream. Bad URLs (URI.create/newBuilder
        // throw at request build) and interrupts quarantine to the
        // placeholder row like any transport error.
        try {
          val req = java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(urlFor(k)))
            .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
            .GET().build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() == 200) Some(resp.body()) else None
        } catch {
          case _: InterruptedException =>
            Thread.currentThread().interrupt(); None
          case scala.util.control.NonFatal(_) => None
        }
      }
    }
}
