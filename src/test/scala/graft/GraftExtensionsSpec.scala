package graft

import org.apache.spark.sql.graft.FunctionShim
import graft.operators.Similarity

/** SQL surface for the custom Catalyst expressions (builder mandate (c):
  * expressions registered via SparkSessionExtensions). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  FunctionShim.registerAll(spark)

  test("graft_cosine matches the Column API expression") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D)) AS c")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val o = spark.sql("SELECT graft_cosine(a, b) FROM vecs").as[Double].head()
    assert(o == 0.0)
  }

  test("graft_simhash64 and graft_hyperplane_sig run in SQL") {
    val h = spark.sql(
      "SELECT graft_simhash64(array('a', 'b', 'c')) AS h").as[Long].head()
    val viaCol = Seq(Seq("a", "b", "c")).toDF("t")
      .select(graft.functions.VectorExpressions.simHash64($"t")).as[Long].head()
    assert(h == viaCol)
    val sig = spark.sql(
      "SELECT graft_hyperplane_sig(array(1.0D, -2.0D, 0.5D), 12) AS s")
      .as[Long].head()
    val sigCol = Seq(Seq(1.0, -2.0, 0.5)).toDF("v")
      .select(Similarity.hyperplaneSignature($"v", 12)).as[Long].head()
    assert(sig == sigCol)
  }

  test("graft_top_k aggregates per group with map-side truncation") {
    (0L until 100L).map(i => (i % 4, i, (i % 17).toDouble))
      .toDF("g", "id", "score").createOrReplaceTempView("scores")
    val rows = spark.sql(
      """SELECT g, graft_top_k(struct(CAST(score AS DOUBLE), id), 3) AS tk
        |FROM scores GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val tk = r.getSeq[org.apache.spark.sql.Row](1)
      assert(tk.length == 3)
      // best-first, ties to the lower id
      assert(tk.map(_.getDouble(0)).sliding(2).forall(p => p(0) >= p(1)))
      assert(tk.head.getDouble(0) == 16.0)
    }
  }

  test("graft_shingles and graft_fingerprint run in SQL") {
    val sh = spark.sql(
      "SELECT graft_shingles(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c a", "c a b")) // distinct, in-order
    val fp = spark.sql(
      "SELECT graft_fingerprint('spark is a unified analytics engine', 8, 4) AS f")
      .as[Seq[Long]].head()
    val viaCol = Seq("spark is a unified analytics engine").toDF("t")
      .select(graft.operators.TextAnalysis.fingerprint($"t", 8, 4))
      .as[Seq[Long]].head()
    assert(fp == viaCol && fp.length == 4)
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
