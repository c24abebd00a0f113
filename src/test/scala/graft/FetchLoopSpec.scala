package graft

import java.nio.file.Files

import graft.sources.{FetchPlanner, LoopbackApi}

/** Live-HTTP integration for the S9 fetchers (VERDICT r8 item 2): a real
  * JDK HttpClient driven through a real fetch → checkpoint → kill →
  * restart cycle against an in-process loopback server — the
  * ExternalApiResultsFetcher.py:193-288 semantics with actual
  * connections, zero egress. */
object FetchLoopSpec {
  /** executor-static client counter (local mode: same JVM). */
  val clients = new java.util.concurrent.atomic.AtomicInteger(0)
}

class FetchLoopSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int) = (1 to n).map(_.toString).toDF("key")

  test("fetch→checkpoint→kill→restart resumes at exactly the " +
      "un-checkpointed keys, over real HTTP") {
    val api = new LoopbackApi(k => Some(s"""{"id":$k,"v":"val$k"}"""))
    val ck = Files.createTempDirectory("fetchck").toString + "/ot"
    try {
      val base = api.base // capture the string, not the server
      // run 1: killed after one 25-key batch (the reference's dump size)
      val partial = FetchPlanner.fetchLoop(keys(60), "key", ck, 25,
        FetchPlanner.httpFetcher(k => s"$base/$k"), maxBatches = 1)
      assert(partial.count() == 25)
      assert(api.totalRequests == 25)
      val firstRun = {
        val s = scala.collection.mutable.Set[String]()
        api.requests.forEach((k, _) => s += k)
        s.toSet
      }
      // restart: the anti-join remainder only — 35 keys, none refetched
      val full = FetchPlanner.fetchLoop(keys(60), "key", ck, 25,
        FetchPlanner.httpFetcher(k => s"$base/$k"))
      assert(full.count() == 60)
      assert(api.totalRequests == 60)
      assert(api.doubleFetched.isEmpty,
        s"keys fetched twice across restart: ${api.doubleFetched}")
      val secondRun = {
        val s = scala.collection.mutable.Set[String]()
        api.requests.forEach((k, _) => s += k)
        s.toSet
      } -- firstRun
      assert(firstRun.intersect(secondRun).isEmpty)
      assert((firstRun ++ secondRun) == (1 to 60).map(_.toString).toSet)
      // every fetched body is the server's JSON, delivered over the wire
      val got = full.filter("key = '7'").select("json", "ok")
        .as[(String, Boolean)].head()
      assert(got == (("""{"id":7,"v":"val7"}""", true)))
    } finally api.close()
  }

  test("batches fetch in parallel: one client per partition, several " +
      "partitions per batch") {
    val api = new LoopbackApi(k => Some(s"""{"k":$k}"""))
    val ck = Files.createTempDirectory("fetchck").toString + "/par"
    FetchLoopSpec.clients.set(0)
    try {
      val base = api.base
      val counted: () => String => Option[String] = () => {
        FetchLoopSpec.clients.incrementAndGet() // one per partition
        FetchPlanner.httpFetcher(k => s"$base/$k")()
      }
      FetchPlanner.fetchLoop(keys(100), "key", ck, 100, counted)
      // batchSize 100 → 100/25 = 4 partitions → 4 clients, not 1
      assert(FetchLoopSpec.clients.get() == 4)
      assert(api.totalRequests == 100 && api.doubleFetched.isEmpty)
    } finally api.close()
  }

  test("failed fetches checkpoint a placeholder and are never refetched") {
    val api = new LoopbackApi(k =>
      if (k.toInt % 10 == 0) None else Some(s"""{"id":$k}"""))
    val ck = Files.createTempDirectory("fetchck").toString + "/fail"
    try {
      val base = api.base
      val res = FetchPlanner.fetchLoop(keys(30), "key", ck, 25,
        FetchPlanner.httpFetcher(k => s"$base/$k"))
      assert(res.count() == 30)
      val failed = res.filter("not ok").select("key", "json")
        .as[(String, String)].collect().toMap
      assert(failed == Map("10" -> "{}", "20" -> "{}", "30" -> "{}"))
      // a rerun over the same universe is a no-op: placeholders count as
      // done (the reference's empty-dict semantics — recorded, surfaced,
      // not retried)
      val before = api.totalRequests
      FetchPlanner.fetchLoop(keys(30), "key", ck, 25,
        FetchPlanner.httpFetcher(k => s"$base/$k"))
      assert(api.totalRequests == before)
      assert(api.doubleFetched.isEmpty)
    } finally api.close()
  }

  test("batch boundaries land on the checkpoint: each batch visible " +
      "to a reader immediately after its dump") {
    val api = new LoopbackApi(k => Some(s"""{"k":$k}"""))
    val ck = Files.createTempDirectory("fetchck").toString + "/steps"
    try {
      val base = api.base
      for (step <- 1 to 3) {
        FetchPlanner.fetchLoop(keys(50), "key", ck, 20,
          FetchPlanner.httpFetcher(k => s"$base/$k"), maxBatches = 1)
        val expect = math.min(step * 20, 50)
        assert(FetchPlanner.loadCheckpoint(spark, ck, "key").count() ==
          expect)
      }
      assert(api.doubleFetched.isEmpty)
    } finally api.close()
  }
}
