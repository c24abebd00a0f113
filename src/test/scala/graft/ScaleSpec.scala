package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's result") {
    val big = (1 to 1000).map(i => (i % 7, s"row$i")).toDF("k", "payload")
    val small = (0 to 6).map(i => (i, s"dim$i")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val salted = Scale.saltedJoin(big, small, "k", salts = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.length == 1000) // every big row matched exactly once
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "k", 4, "bucketed_a")
    Scale.writeBucketed(b, "k", 4, "bucketed_b")
    val joined = Scale.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
    // no shuffle exchange in the join's physical plan: buckets co-located
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free join:\n$plan")
    assert(joined.count() == 500)
  }

  test("W6 exemplar is deterministic per seed and needs no RNG state") {
    import graft.operators.Scale
    val df = (1 to 500).map(i => (i.toLong, s"name-$i")).toDF("id", "name")
    val a = Scale.exemplar(df, Seq("id"), seed = 7L).collect().toSeq
    val b = Scale.exemplar(df, Seq("id"), seed = 7L).collect().toSeq
    assert(a == b && a.size == 1)
    val c = Scale.exemplar(df, Seq("id"), seed = 8L, n = 3).collect().toSeq
    assert(c.size == 3 && c != a)
  }

  test("skewReport surfaces the hot key with exact share and median ratio") {
    import org.apache.spark.sql.functions.col
    // 1 hot key (60 rows), 20 cold keys (2 rows each): median count 2
    val rows = (Seq.fill(60)(999L) ++ (1L to 20L).flatMap(k => Seq(k, k)))
      .toDF("k")
    val got = Scale.skewReport(rows, "k", topK = 3)
      .orderBy("rank").collect()
    assert(got.length == 3)
    val hot = got(0)
    assert(hot.getAs[Long]("key") == 999L && hot.getAs[Long]("n") == 60L)
    assert(hot.getAs[Double]("share") == 60.0 / 100.0)
    assert(hot.getAs[Double]("skew_vs_median") == 30.0)
    // cold ties break by key ascending
    assert(got(1).getAs[Long]("key") == 1L && got(2).getAs[Long]("key") == 2L)
  }

  test("deterministicSplit is stable, total, and roughly proportional") {
    import graft.operators.Scale
    import org.apache.spark.sql.functions._
    val df = (1 to 2000).map(i => s"doc-text-$i").toDF("k")
    val counts = df.select(Scale.deterministicSplit($"k").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000)
    // 13/16, 2/16, 1/16 within loose tolerance
    assert(math.abs(counts("train") - 2000.0 * 13 / 16) < 200)
    assert(counts("val") > counts("test"))
    // same keys -> same assignment on re-evaluation
    val again = df.select(Scale.deterministicSplit($"k").as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
    intercept[IllegalArgumentException] {
      Scale.deterministicSplit($"k", Seq("a" -> 8, "b" -> 9))
    }
  }

  test("skylineMin: dominance by comparisons, exact ties both survive") {
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 7L), (3L, 2L, 4L), (4L, 3L, 4L),
      (5L, 5L, 1L), (6L, 6L, 1L), (7L, 2L, 4L)).toDF("id", "x", "y")
    val got = Scale.skylineMin(pts, "x", "y").collect()
      .map(_.getLong(0)).toSet
    // (1,5) frontier; (1,7) dominated by (1,5); (2,4) frontier TWICE
    // (ids 3 and 7 tie exactly - neither dominates); (3,4) dominated by
    // (2,4); (5,1) frontier; (6,1) dominated by (5,1)
    assert(got == Set(1L, 3L, 7L, 5L))
  }

  test("compactionBins assigns by start offset and bounds overshoot") {
    val df = Seq(("p", 1L, 10L), ("p", 2L, 10L), ("p", 3L, 10L),
      ("q", 1L, 100L)).toDF("part", "ord", "sz")
    val got = Scale.compactionBins(df, "part", "ord", "sz", 15L)
      .orderBy("part", "bin")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // p: starts 0,10,20 → bins 0,0,1; q: one oversized row, bin 0
    assert(got === Seq(("p", 0L, 2L, 20L, 1L, 2L),
      ("p", 1L, 1L, 10L, 3L, 3L), ("q", 0L, 1L, 100L, 1L, 1L)))
  }

  test("compactionBins: a row bigger than the target gets its own bin " +
    "and the next row starts a new one") {
    val df = Seq(("p", 1L, 100L), ("p", 2L, 1L)).toDF("part", "ord", "sz")
    val got = Scale.compactionBins(df, "part", "ord", "sz", 15L)
      .orderBy("bin").as[(String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // row 1 starts at offset 0 → bin 0; row 2 starts at 100 → bin 6
    assert(got === Seq(("p", 0L, 1L, 100L, 1L, 1L),
      ("p", 6L, 1L, 1L, 2L, 2L)))
  }

  test("systematicWeightedSample keeps rows covering step multiples") {
    val df = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
      .toDF("id", "w")
    val got = Scale.systematicWeightedSample(df, "id", "w", 5L)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // cums 3,6,9,12; intervals [0,3) [3,6) [6,9) [9,12): multiples
    // 0, 5, 10 land in rows 1, 2, 4 — row 3 skipped
    assert(got === Seq((1L, 3L, 3L), (2L, 3L, 6L), (4L, 3L, 12L)))
  }

  test("systematicWeightedSample always keeps rows heavier than step") {
    val df = Seq((1L, 1L), (2L, 12L), (3L, 1L)).toDF("id", "w")
    val got = Scale.systematicWeightedSample(df, "id", "w", 5L)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // heavy row 2 covers 5 AND 10; row 1 covers 0; row 3's [13,14) none
    assert(got.map(_._1) === Seq(1L, 2L))
  }
}
