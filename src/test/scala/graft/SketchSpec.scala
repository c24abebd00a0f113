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

  // ---------------------------------------------------------------
  // KLL-lite quantile sketch
  // ---------------------------------------------------------------

  private def kllRow(values: Seq[Double], k: Int, parts: Int): Row =
    values.toDF("v").repartition(parts)
      .agg(VectorExpressions.kllSketch(col("v"), k).as("s"))
      .select(Seq(col("s.n"), col("s.err_bound"), col("s.items")) ++
        (0.01 +: (1 to 19).map(_ * 0.05) :+ 0.99).distinct.map(p =>
          VectorExpressions.kllQuantile(col("s"), p).as(s"p$p")): _*)
      .head()

  test("kll is exact (err_bound 0) when k exceeds the input") {
    // a deterministic permutation of 1..100
    val values = (1 to 100).map(_.toDouble).sortBy(v => (v * 37) % 101)
    for (parts <- Seq(1, 4)) {
      val r = kllRow(values, k = 256, parts = parts)
      assert(r.getLong(0) == 100L && r.getLong(1) == 0L, s"parts=$parts")
      // rank-pick quantiles off an exact summary equal the true values
      assert(r.getDouble(r.fieldIndex("p0.5")) == 50.0, s"parts=$parts")
      assert(r.getDouble(r.fieldIndex("p0.99")) == 99.0, s"parts=$parts")
    }
  }

  test("kll rank error stays within the self-certified bound at every " +
       "partitioning, and the bound within the theory budget") {
    val n = 20000
    val m = 400
    // deterministic shuffle of 1..n so true rank(v) = v
    val values = (1 to n).map(_.toDouble).sortBy(v => (v * 7919) % 20011)
    for (parts <- Seq(1, 4, 32)) {
      val r = kllRow(values, k = m, parts = parts)
      assert(r.getLong(0) == n.toLong, s"parts=$parts")
      val err = r.getLong(1)
      // err_bound <= ~2 n log2(n/m) / m (x2 slack for merge re-compactions)
      val budget = (4.0 * n * (math.log(n.toDouble / m) / math.log(2)) / m).toLong
      assert(err > 0 && err <= budget, s"parts=$parts err=$err budget=$budget")
      // mass conservation: summary weights account for every row
      val mass = r.getSeq[Row](2).map(_.getLong(1)).sum
      assert(mass == n.toLong, s"parts=$parts mass=$mass")
      // every quantile's estimate has true rank within err_bound of target
      for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val est = r.getDouble(r.fieldIndex(s"p$p"))
        val target = math.ceil(p * n).toLong
        assert(math.abs(est.toLong - target) <= err,
          s"parts=$parts p=$p est=$est target=$target err=$err")
      }
    }
  }

  test("kll sketch is SQL-callable via graft_kll_sketch") {
    org.apache.spark.sql.graft.FunctionShim.registerAll(spark)
    (1 to 50).map(_.toDouble).toDF("v").createOrReplaceTempView("kll_in")
    val r = spark.sql(
      "SELECT graft_kll_sketch(CAST(v AS DOUBLE), 64) AS s FROM kll_in")
      .select(col("s.n"), col("s.err_bound")).head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 0L)
  }

  private def cmEst(items: Seq[String], queries: Seq[String], d: Int,
      w: Int, parts: Int): Map[String, Long] = {
    val sk = items.toDF("item").repartition(parts)
      .agg(VectorExpressions.cmSketch(col("item"), d, w).as("m"))
    val q = queries.toDF("q")
    q.crossJoin(sk)
      .select(col("q"),
        VectorExpressions.cmEstimate(col("m"), col("q"), d, w).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("CmSketch is exact when width dwarfs the vocabulary") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    for (parts <- Seq(1, 4)) {
      val got = cmEst(items, Seq("a", "b", "c", "zz"), d = 4,
        w = 1024, parts = parts)
      assert(got("a") == 30L && got("b") == 20L && got("c") == 10L,
        s"parts=$parts")
      assert(got("zz") == 0L, s"parts=$parts: unseen item overcounted")
    }
  }

  test("CmSketch estimates are upper bounds even under forced collisions") {
    val truth = (1 to 50).map(i => s"k$i" -> (i % 7 + 1).toLong).toMap
    val items = truth.toSeq.flatMap { case (k, n) => Seq.fill(n.toInt)(k) }
    val got = cmEst(items, truth.keys.toSeq, d = 3, w = 8, parts = 5)
    truth.foreach { case (k, n) =>
      assert(got(k) >= n, s"$k: CM must never undercount")
    }
  }

  test("CmSketch is deterministic across partitionings (unlike MG)") {
    val items = (1 to 500).map(i => s"it${i % 37}")
    val a = cmEst(items, Seq("it0", "it5", "it36"), 4, 64, parts = 1)
    val b = cmEst(items, Seq("it0", "it5", "it36"), 4, 64, parts = 9)
    assert(a == b)
  }
}
