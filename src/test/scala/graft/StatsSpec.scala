package graft

import graft.operators.{Scale, Stats}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("exactQuartiles picks lower-quantile elements by rank") {
    // n=5: positions (4*1)div4+1=2, (4*2)div4+1=3, (4*3)div4+1=4
    val df = Seq(("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("a", 50L),
      ("b", 7L)).toDF("k", "v")
    val got = Stats.exactQuartiles(df, "k", "v")
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 20L, 30L, 40L, 5L), ("b", 7L, 7L, 7L, 1L)))
  }

  test("exactQuartiles is insensitive to duplicate values") {
    val df = Seq.fill(4)(("a", 5L)).toDF("k", "v")
    val got = Stats.exactQuartiles(df, "k", "v")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 5L, 5L, 5L, 4L)))
  }

  test("groupedLinReg recovers an exact line and drops degenerate keys") {
    val line = (1L to 5L).map(x => ("l", x, 2 * x + 3))
    val flat = Seq(("f", 4L, 1L), ("f", 4L, 9L)) // zero x-spread: dropped
    val got = Stats.groupedLinReg((line ++ flat).toDF("k", "x", "y"),
      "k", "x", "y").as[(String, Long, Double, Double)].collect().toSeq
    assert(got === Seq(("l", 5L, 2.0, 3.0)))
  }

  test("modePerKey breaks count ties on the smaller value") {
    val df = Seq(("u", "b"), ("u", "b"), ("u", "a"), ("u", "a"), ("u", "c"))
      .toDF("k", "v")
    val got = Stats.modePerKey(df, "k", "v")
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("u", "a", 2L)))
  }

  test("dayStreaks merges consecutive days and splits on gaps") {
    val df = Seq((1L, 10L), (1L, 11L), (1L, 11L), (1L, 12L), (1L, 20L),
      (2L, 5L)).toDF("u", "day")
    val got = Stats.dayStreaks(df, "u", "day")
      .orderBy("u", "start_day").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L, 12L, 3L), (1L, 20L, 20L, 1L),
      (2L, 5L, 5L, 1L)))
  }

  test("lag1Autocorr is 1 on a linear series and -1 on an alternation") {
    val inc = (1L to 6L).map(i => ("inc", i, i, 10 * i))
    val alt = (1L to 6L).map(i => ("alt", i, i, if (i % 2 == 0) 1L else 5L))
    val const = (1L to 4L).map(i => ("const", i, i, 7L)) // zero variance
    val got = Stats.lag1Autocorr((inc ++ alt ++ const).toDF("k", "o1", "o2", "v"),
      "k", Seq("o1", "o2"), "v")
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq("alt", "inc"))
    assert(math.abs(got(0)._3 + 1.0) < 1e-12 && got(0)._2 === 5L)
    assert(math.abs(got(1)._3 - 1.0) < 1e-12 && got(1)._2 === 5L)
  }

  test("unpivotLong is the long inverse of a wide aggregate") {
    val wide = Seq(("x", 1L, 10L)).toDF("id", "m1", "m2")
    val got = Scale.unpivotLong(wide, Seq("id"), Seq("m1", "m2"))
      .orderBy("metric").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("x", "m1", 1L), ("x", "m2", 10L)))
  }
}
