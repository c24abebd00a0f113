package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.functions.VectorExpressions

/** Misra-Gries heavy-hitter sketch: exactness when k covers the
  * vocabulary, the n/(k+1) guarantee under pressure, and merge behavior
  * across partitionings (guarantees hold; estimates may shift within the
  * bound). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int): Seq[(String, Long)] =
    items.toDF("item").repartition(parts)
      .agg(VectorExpressions.freqSketch(col("item"), k).as("s"))
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("exact counts when k covers the whole vocabulary") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    for (parts <- Seq(1, 4)) {
      val got = sketch(items, k = 8, parts = parts)
      assert(got == Seq(("a", 30L), ("b", 20L), ("c", 10L)), s"parts=$parts")
    }
  }

  test("heavy hitter survives pressure within the n/(k+1) bound") {
    // one item at 40% + a long tail of singletons, k far below |vocab|
    val n = 1000
    val items = Seq.fill(400)("HOT") ++ (1 to 600).map(i => s"rare$i")
    for (parts <- Seq(1, 7)) {
      val got = sketch(items, k = 9, parts = parts).toMap
      assert(got.contains("HOT"), s"parts=$parts: hot item must survive")
      val est = got("HOT")
      // lower bound, undercounting by at most n/(k+1) = 100
      assert(est <= 400L && est >= 400L - n / 10, s"parts=$parts est=$est")
    }
  }

  test("sketch is SQL-callable via graft_freq_sketch") {
    org.apache.spark.sql.graft.FunctionShim.registerAll(spark)
    (Seq.fill(9)("x") ++ Seq("y")).toDF("item").createOrReplaceTempView("sk_in")
    val got = spark.sql(
      "SELECT graft_freq_sketch(item, 4) AS s FROM sk_in")
      .head().getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == (("x", 9L)))
  }
}
