package graft
import org.apache.spark.sql.SparkSession

/** Fixed-gate drift canary (VERDICT r8 item 1): the cross-run
  * complement of Bench's within-run sentinel. Runs the SAME gates
  * (the five r7→r8 movers q56/q65/q89/q98/q99, the four most expensive
  * iterative gates q50/q61/q82/q85, the q01 sentinel, — r10 verdict
  * item 3 — one search-family row q91 and one merge-family row q97, so
  * bench-tail moves in those families get a direct fresh-JVM reading
  * instead of sentinel inference, and — r11 verdict item 5 — the ANN
  * lifecycle's most expensive gate q309, so compaction-plan drift gets
  * fresh-JVM detection too) once each in
  * a fresh JVM; `tools/canary.sh` invokes it three times and takes the
  * per-gate min, so a >1.3× move between two canary records is a plan
  * change, not host noise — host noise does not survive fresh-JVM
  * best-of-3 on both sides. Prints ONE JSON line like Bench. */
object Canary {
  val gates: Seq[String] = Seq(
    "q01_pricing_summary", "q50_near_dup_components",
    "q56_stratified_sample", "q61_lsh_index", "q65_skew_report",
    "q82_bucketed_hierarchy", "q85_components_star", "q89_ivfpq_index",
    "q91_bm25_view", "q97_merge_agg",
    "q98_pagerank", "q99_personalized_pagerank",
    "q309_ann_delta_compaction")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // codegen warmup
    def releaseAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    val qs = SparkEntry.queries
    // Bench's exact per-gate discipline (best-of-2, releaseAll between)
    // so canary numbers are comparable to bench tails, minus the
    // run-position effect (Bench reaches these gates after ~150 others)
    val times = gates.map { name =>
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        releaseAll()
        dt
      }.min
      name -> best
    }
    println(times.map { case (k, v) => s"\"$k\":$v" }
      .mkString("""{"canary":{""", ",", s"""},"sf":"$sfDir"}"""))
    spark.stop()
  }
}
