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
}
