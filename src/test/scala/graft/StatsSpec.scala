package graft

import graft.operators.{Scale, Stats}
import org.apache.spark.sql.functions.abs

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

  test("madOutliers flags only deviations beyond k times the MAD") {
    // values 10,12,14,16,100: median=14, devs 4,2,0,2,86 -> MAD=2
    // k=5: threshold 10, only the 100 row (dev 86) is out
    val df = Seq((1L, "t", 10L), (2L, "t", 12L), (3L, "t", 14L),
      (4L, "t", 16L), (5L, "t", 100L)).toDF("id", "k", "v")
    val got = Stats.madOutliers(df, "k", "v", k = 5)
      .select("id", "v", "median", "mad")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((5L, 100L, 14L, 2L)))
  }

  test("cusumAlarms tracks the clamped recursion and first crossing") {
    // target 10: x=15,15,2,15 -> S=5,10,2,7; threshold 10 crossed at i=2
    val df = Seq((1L, 1L, 0L, 15L), (1L, 2L, 0L, 15L), (1L, 3L, 0L, 2L),
      (1L, 4L, 0L, 15L), (2L, 1L, 0L, 5L)).toDF("k", "o1", "o2", "v")
    val got = Stats.cusumAlarms(df, "k", "o1", "o2", "v",
      target = 10L, threshold = 10L)
      .orderBy("k").as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, 4L, 10L, Some(2L)), (2L, 1L, 0L, None)))
  }

  test("decileLift computes exact cumulative capture and lift") {
    // 20 rows, scores 20..1, positives at the top 4 scores
    val df = (1L to 20L).map(i => (i, 21L - i, if (i <= 4) 1 else 0))
      .toDF("id", "score", "lab")
    val got = Stats.decileLift(df, "score", "id", "lab")
      .orderBy("decile")
      .select("decile", "n", "pos", "cum_n", "cum_pos", "lift")
      .as[(Int, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.length === 10 && got.forall(_._2 === 2L))
    assert(got.head === ((1, 2L, 2L, 2L, 2L, 5.0))) // 100% vs 20% base
    assert(got(1)._5 === 4L && got(1)._6 === 5.0)
    assert(got(2)._5 === 4L && math.abs(got(2)._6 - (4.0 / 6.0) / 0.2) < 1e-12)
    assert(got.last._6 === 1.0) // full-population lift is 1 by definition
  }

  test("rollingBandBreakout flags the spike and skips warm-up rows") {
    val base = (1L to 8L).map(i => (1L, i, 10L + (i % 2))) // 10,11 alternation
    val spike = Seq((1L, 9L, 100L))
    val got = Stats.rollingBandBreakout(
      (base ++ spike).toDF("k", "o", "v"), "k", Seq("o"), "v",
      window = 10, k = 2, minObs = 5)
      .select("o", "v").as[(Long, Long)].collect().toSeq
    assert(got === Seq((9L, 100L))) // rows 1-5 under minObs; 6-8 in band
  }

  test("histogramFixed clamps under/overflow into the edge bins") {
    val df = Seq(("a", -5L), ("a", 0L), ("a", 9L), ("a", 10L), ("a", 25L),
      ("a", 999L)).toDF("k", "v")
    val got = Stats.histogramFixed(df, "k", "v", lo = 0L, width = 10L,
      nBins = 3).orderBy("bin").as[(String, Long, Long)].collect().toSeq
    // bins: [-inf,10)→0 (clamped -5 plus 0,9), [10,20)→1, [20,inf)→2
    assert(got === Seq(("a", 0L, 3L), ("a", 1L, 1L), ("a", 2L, 2L)))
  }

  test("bandJoin equals the naive all-pairs filter") {
    val rng = new scala.util.Random(7)
    val a = (1L to 60L).map(i => (i, rng.nextInt(500).toLong)).toDF("ia", "va")
    val b = (1L to 60L).map(i => (i, rng.nextInt(500).toLong)).toDF("ib", "vb")
    val got = Stats.bandJoin(a, b, "va", "vb", delta = 25L)
      .select("ia", "ib").orderBy("ia", "ib")
      .as[(Long, Long)].collect().toSeq
    val naive = a.crossJoin(b)
      .filter(abs($"va" - $"vb") <= 25L)
      .select("ia", "ib").orderBy("ia", "ib")
      .as[(Long, Long)].collect().toSeq
    assert(got === naive && got.nonEmpty)
    // and the bucketed plan produces no duplicate pairs
    assert(got === got.distinct)
  }

  test("weightedMedianPerKey selects the running-weight crossing value") {
    // weights: 1@10, 2@20, 5@30 → W=8, T=(8+1)div2=4, crossing at 30
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 5L),
      ("b", 7L, 1L)).toDF("k", "v", "w")
    val got = Stats.weightedMedianPerKey(df, "k", "v", "w")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 30L, 8L), ("b", 7L, 1L)))
    // all-equal weights reduce to the plain lower median
    val eq = (1L to 4L).map(v => ("e", v, 1L)).toDF("k", "v", "w")
    assert(Stats.weightedMedianPerKey(eq, "k", "v", "w")
      .as[(String, Long, Long)].collect().toSeq === Seq(("e", 2L, 4L)))
  }

  test("topPercent keeps max(1, n*pct div 100) rows from the top") {
    val df = (1L to 25L).map(i => ("g", i, i)).toDF("k", "v", "id")
    val got = Stats.topPercent(df, "k", "v", "id", pct = 10)
      .select("v").as[Long].collect().toSeq.sorted
    assert(got === Seq(24L, 25L)) // (25*10) div 100 = 2 rows
    val tiny = Seq(("g", 5L, 1L)).toDF("k", "v", "id")
    assert(Stats.topPercent(tiny, "k", "v", "id", 10).count() === 1L)
  }

  test("minMaxNorm scales to 0..10000 and drops constant groups") {
    val df = Seq(("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 200L),
      ("c", 4L, 9L), ("c", 5L, 9L)).toDF("k", "id", "v")
    val got = Stats.minMaxNorm(df, "k", "v")
      .orderBy("id").select("id", "norm").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 5000L), (3L, 10000L)))
  }

  test("maxDrawdown tracks the worst drop from a running peak") {
    // series 10, 30, 5, 20, 15: peak 30, worst drop 30-5=25
    val df = Seq((1L, 1L, 10L), (1L, 2L, 30L), (1L, 3L, 5L),
      (1L, 4L, 20L), (1L, 5L, 15L)).toDF("k", "o", "v")
    val got = Stats.maxDrawdown(df, "k", Seq("o"), "v")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 25L, 30L, 5L)))
  }

  test("mannWhitneyU2 matches the closed form and the U-sum identity") {
    // A = {1,2}, B = {3,4}: all B above all A → U_A = 0, U_B = 4
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val got = Stats.mannWhitneyU2(df, "g", "v", "a", "b")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((2L, 2L, 0L, 8L)))
    // full tie: every value equal → U2 splits evenly (tie midranks)
    val tie = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val t = Stats.mannWhitneyU2(tie, "g", "v", "a", "b")
      .as[(Long, Long, Long, Long)].collect().head
    assert(t._3 === 4L && t._4 === 4L && t._3 + t._4 === 2 * t._1 * t._2)
  }

  test("abcClassify cuts classes at cross-multiplied share thresholds") {
    // revenues 80, 15, 4, 1 (total 100): cum 80→A, 95→B, 99→C, 100→C
    val df = Seq((1L, 80L), (2L, 15L), (3L, 4L), (4L, 1L)).toDF("id", "v")
    val got = Stats.abcClassify(df, "id", "v")
      .orderBy("id").select("abc_class").as[String].collect().toSeq
    assert(got === Seq("A", "B", "C", "C"))
  }

  test("giniCoefficient: zero for equality, (n-1)/n-scaled for " +
    "total concentration") {
    val equal = (1L to 4L).map(i => (i, 10L)).toDF("id", "v")
    val g0 = Stats.giniCoefficient(equal, "id", "v")
      .as[(Long, Long, Double)].collect().head
    assert(g0._1 === 4L && g0._2 === 40L && math.abs(g0._3) < 1e-15)
    // one holder of everything: G = (n-1)/n = 0.75
    val conc = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L)).toDF("id", "v")
    val g1 = Stats.giniCoefficient(conc, "id", "v")
      .as[(Long, Long, Double)].collect().head
    assert(math.abs(g1._3 - 0.75) < 1e-15)
  }

  test("unpivotLong is the long inverse of a wide aggregate") {
    val wide = Seq(("x", 1L, 10L)).toDF("id", "m1", "m2")
    val got = Scale.unpivotLong(wide, Seq("id"), Seq("m1", "m2"))
      .orderBy("metric").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("x", "m1", 1L), ("x", "m2", 10L)))
  }

  test("welchT reproduces the hand-computed statistic and df") {
    // A = {1,2,3}: n=3 Σ=6 Σ²=14 → var = (3·14−36)/6 = 1
    // B = {2,4,6,8}: n=4 Σ=20 Σ²=120 → var = (4·120−400)/12 = 20/3
    val df = (Seq(1L, 2L, 3L).map(("A", _)) ++
      Seq(2L, 4L, 6L, 8L).map(("B", _))).toDF("g", "v")
    val r = Stats.welchT(df, "g", "v", "A", "B")
      .as[(Long, Long, Double, Double)].collect().head
    assert(r._1 === 3L && r._2 === 4L)
    val sea = 1.0 / 3.0
    val seb = (20.0 / 3.0) / 4.0
    val t = (2.0 - 5.0) / math.sqrt(sea + seb)
    val dfW = math.pow(sea + seb, 2) /
      (sea * sea / 2.0 + seb * seb / 3.0)
    assert(math.abs(r._3 - t) < 1e-12 && math.abs(r._4 - dfW) < 1e-12)
  }

  test("chiSquareContingency: exact marginals and per-cell terms") {
    val df = (Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2")))
      .toDF("r0", "c0")
    val got = Stats.chiSquareContingency(df, "r0", "c0")
      .orderBy("r", "c")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    // num = obs·100 − row·col = ±200 for every cell of this table
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) === Seq(
      ("r1", "c1", 10L, 30L, 40L, 100L),
      ("r1", "c2", 20L, 30L, 60L, 100L),
      ("r2", "c1", 30L, 70L, 40L, 100L),
      ("r2", "c2", 40L, 70L, 60L, 100L)))
    val exp = Seq(40000.0 / 120000.0, 40000.0 / 180000.0,
      40000.0 / 280000.0, 40000.0 / 420000.0)
    got.map(_._7).zip(exp).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-15)
    }
  }

  test("holtLinear replays the α=β=1/2 recursion") {
    val df = Seq(("k", 1L, 4L), ("k", 2L, 8L), ("k", 3L, 6L))
      .toDF("g", "t", "x")
    val got = Stats.holtLinear(df, "g", "t", "x")
      .orderBy("t").as[(String, Long, Double, Double, Double)]
      .collect().toSeq
    // l: 4, (8+4)/2=6, (6+6+1)/2=6.5; b: 0, 1, 0.75
    assert(got === Seq(("k", 1L, 4.0, 0.0, 4.0),
      ("k", 2L, 6.0, 1.0, 7.0), ("k", 3L, 6.5, 0.75, 7.25)))
  }

  test("quantileNormalize maps ranks onto the pooled distribution") {
    val df = Seq(("A", 10L, 1L), ("A", 20L, 2L), ("B", 30L, 3L),
      ("B", 40L, 4L), ("C", 50L, 5L)).toDF("k", "v", "id")
    val got = Stats.quantileNormalize(df, "k", "v", "id")
      .orderBy("id").as[(Long, String, Long, Long)].collect().toSeq
    // 2-element keys stretch to the pooled extremes (pos 1 and 5);
    // the singleton key C lands on the pooled lower median (pos 3)
    assert(got.map(_._4) === Seq(10L, 50L, 10L, 50L, 30L))
  }

  test("winsorizedStats clamps at exact rank-selected cuts") {
    val df = (1L to 20L).map(("k", _)).toDF("g", "v")
    val got = Stats.winsorizedStats(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    // p5 pos = 19·5 div 100 + 1 = 1 → cut 1; p95 pos = 19 → cut 19
    assert(got === (("k", 20L, 1L, 19L, 209L, 0L, 1L)))
  }

  test("correlationMatrix: all pairs from one fold, exact ±1 cases") {
    val df = Seq((1L, 2L, 3L), (2L, 4L, 2L), (3L, 6L, 1L))
      .toDF("x", "y", "z")
    val got = Stats.correlationMatrix(df, Seq("x", "y", "z"))
      .orderBy("var_a", "var_b")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(("x", "y", 3L, 1.0), ("x", "z", 3L, -1.0),
      ("y", "z", 3L, -1.0)))
  }

  test("tvdDrift folds absent bins in closed form") {
    // A: bins {1:2, 2:2}; B: bins {1:1, 3:1}; pooled m = {1:3, 2:2, 3:1}
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 1L), ("B", 3L)).toDF("k", "b")
    val got = Stats.tvdDrift(df, "k", "b").orderBy("k")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", 4L, 8L, 8.0 / 48.0),
      ("B", 2L, 8L, 8.0 / 24.0)))
  }

  test("ksStatistic: exact integer numerator at the CDF gap") {
    val df = Seq(("A", 1L), ("A", 3L), ("B", 2L), ("B", 3L))
      .toDF("g", "v")
    val r = Stats.ksStatistic(df, "g", "v", "A", "B")
      .as[(Long, Long, Long, Double)].collect().head
    // the gap is at v=1: F_A = 1/2, F_B = 0 → D = 1/2
    assert(r === ((2L, 2L, 2L, 0.5)))
  }

  test("spearman: monotone nonlinear is a perfect 1.0; ties averaged") {
    val df = Seq((1L, 1L), (2L, 4L), (3L, 9L)).toDF("x", "y")
    val r = Stats.spearman(df, "x", "y").as[(Long, Double)].collect().head
    assert(r === ((3L, 1.0)))
    val tied = Seq((1L, 3L), (1L, 3L), (2L, 5L)).toDF("x", "y")
    val r2 = Stats.spearman(tied, "x", "y").as[(Long, Double)]
      .collect().head
    assert(r2 === ((3L, 1.0)))
  }

  test("twoProportionZ replays the fixed pooled-p chain") {
    val df = (Seq.fill(2)(("A", true)) ++ Seq.fill(2)(("A", false)) ++
      Seq(("B", true)) ++ Seq.fill(3)(("B", false))).toDF("g", "s")
    val r = Stats.twoProportionZ(df, "g", "s", "A", "B")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val p = 3.0 / 8.0
    val expect = (0.5 - 0.25) /
      math.sqrt(p * (1.0 - p) * (1.0 / 4.0 + 1.0 / 4.0))
    assert(r === ((4L, 2L, 4L, 1L, expect)))
  }

  test("ksStatistic: identical distributions give D = 0 exactly") {
    val df = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    val r = Stats.ksStatistic(df, "g", "v", "A", "B")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r === ((2L, 2L, 0L, 0.0)))
  }

  test("tvdDrift: a single key carries the whole corpus at TVD 0") {
    val df = Seq(("A", 1L), ("A", 2L)).toDF("k", "b")
    val got = Stats.tvdDrift(df, "k", "b")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("A", 2L, 0L, 0.0)))
  }

  test("holtLinear: a single observation is its own level, zero trend") {
    val df = Seq(("k", 1L, 7L)).toDF("g", "t", "x")
    val got = Stats.holtLinear(df, "g", "t", "x")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("k", 1L, 7.0, 0.0, 7.0)))
  }

  test("crossCorrelation detects a pure one-step lead at +1.0 exactly") {
    // y is x delayed by one tick → corr(x_t, y_{t+1}) = 1 (bit-exact:
    // num/√(num·num) with identical exact moments)
    val df = Seq((1L, 1L, 5L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 9L, 3L))
      .toDF("t", "x", "y")
    val r = Stats.crossCorrelation(df, "t", "x", "y", lag = 1L)
      .as[(Long, Double)].collect().head
    assert(r === ((3L, 1.0)))
    // lag 0 on an anti-correlated pair lands negative
    val df2 = Seq((1L, 1L, 3L), (2L, 2L, 2L), (3L, 3L, 1L))
      .toDF("t", "x", "y")
    val r2 = Stats.crossCorrelation(df2, "t", "x", "y", lag = 0L)
      .as[(Long, Double)].collect().head
    assert(r2 === ((3L, -1.0)))
  }

  test("confusionStats: exact cells, single-division P/R/F1") {
    val df = (Seq.fill(3)((true, true)) ++ Seq((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false)))
      .toDF("p", "t")
    val r = Stats.confusionStats(df, "p", "t")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    assert(r === ((3L, 1L, 2L, 4L, 0.75, 0.6, 2.0 / 3.0)))
  }

  test("rankAuc gives ties half credit") {
    // A = {3,5}, B = {1,3}: wins 3, tie 1 → AUC = 3.5/4
    val df = Seq(("A", 3L), ("A", 5L), ("B", 1L), ("B", 3L))
      .toDF("g", "v")
    val r = Stats.rankAuc(df, "g", "v", "A", "B")
      .as[(Long, Long, Double)].collect().head
    assert(r === ((2L, 2L, 0.875)))
  }

  test("targetEncode: leave-one-out means, singleton falls to global") {
    val df = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 5L)).toDF("id", "cat", "y")
    val got = Stats.targetEncode(df, "cat", "y", "id")
      .orderBy("id").as[(Long, String, Long, Double)].collect().toSeq
    assert(got.map(_._4) === Seq(25.0, 20.0, 15.0, (65.0 - 5.0) / 3.0))
  }

  test("targetEncode plan: both stat sides broadcast, fact table " +
    "shuffles zero times") {
    val df = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 5L))
      .toDF("id", "cat", "y")
    val plan = Stats.targetEncode(df, "cat", "y", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"category/global moments must broadcast:\n$plan")
    // the fact table must not be exchanged for the join itself: the
    // only allowed exchanges are inside the two broadcast stat builds
    val joins = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.forall(l => l.contains("Broadcast")),
      s"every join must be broadcast-side:\n$plan")
  }

  test("benfordCensus takes the textual leading digit, skips <= 0") {
    // 1..19 plus junk: digit 1 appears 11× (1, 10..19), 2..9 once each
    val df = ((1L to 19L) ++ Seq(0L, -5L)).toDF("v")
    val got = Stats.benfordCensus(df, "v").orderBy("digit")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.head === ((1, 11L, 11000L / 19L)))
    assert(got.map(_._1) === (1 to 9) &&
      got.tail.forall(r => r._2 === 1L && r._3 === 1000L / 19L))
  }

  test("cohenKappa computes exact po/pe/kappa from integer marginals") {
    val df = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("a", "b"), ("b", "a"))
      .toDF("r1", "r2")
    // N=5, agree=3, marginals a:3/b:2 both sides, cross = 9+4 = 13
    val got = Stats.cohenKappa(df, "r1", "r2")
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got === ((5L, 3L, 13L, 3.0 / 5.0, 13.0 / 25.0, 2.0 / 12.0)))
  }

  test("cohenKappa is 1 on perfect agreement and 0 at chance") {
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("r1", "r2")
    assert(Stats.cohenKappa(perfect, "r1", "r2")
      .select("kappa").as[Double].head === 1.0)
    // 2x2 uniform: po = 0.5 = pe -> kappa 0
    val chance = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("b", "b"))
      .toDF("r1", "r2")
    assert(Stats.cohenKappa(chance, "r1", "r2")
      .select("kappa").as[Double].head === 0.0)
  }

  test("anovaOneWay reproduces the closed-form decomposition") {
    val df = Seq(("g1", 1L), ("g1", 2L), ("g1", 3L),
      ("g2", 4L), ("g2", 5L), ("g2", 6L)).toDF("g", "v")
    val got = Stats.anovaOneWay(df, "g", "v")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    // S=21 Q=91; sum s_g^2/n_g = 12 + 75 = 87; SSB = 87 - 73.5 = 13.5
    // SSW = 91 - 87 = 4; F = (13.5/1)/(4/4) = 13.5
    assert(got === ((2L, 6L, 21.0, 91.0, 13.5, 4.0, 13.5)))
  }

  test("anovaOneWay F is huge when groups are exactly separated") {
    val df = Seq(("a", 10L), ("a", 10L), ("b", 20L), ("b", 20L)).toDF("g", "v")
    val r = Stats.anovaOneWay(df, "g", "v")
      .select("ss_between", "ss_within").as[(Double, Double)].head
    assert(r === ((100.0, 0.0))) // all variance between groups
  }

  test("bhReject is a step-up procedure: a late pass rescues earlier ranks") {
    val df = Seq(("t1", 0.06), ("t2", 0.09)).toDF("id", "p")
    // q=0.1, m=2: p(1)=0.06 > 0.05 fails, p(2)=0.09 <= 0.10 passes
    // -> cutoff 2 -> BOTH rejected (the step-up hallmark)
    val got = Stats.bhReject(df, "id", "p", qNum = 10, qDenom = 100)
      .orderBy("rank").as[(String, Double, Int, Boolean)].collect().toSeq
    assert(got.map(_._4) === Seq(true, true))
  }

  test("bhReject cuts at the last passing rank and never past it") {
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.5))
      .toDF("id", "p")
    val got = Stats.bhReject(df, "id", "p") // q = 0.05
      .orderBy("rank").as[(String, Double, Int, Boolean)].collect().toSeq
    assert(got.map(_._4) === Seq(true, true, true, false))
    assert(got.map(_._3) === Seq(1, 2, 3, 4))
  }

  test("bhReject rejects nothing when no rank passes") {
    val df = Seq(("a", 0.9), ("b", 0.95)).toDF("id", "p")
    val got = Stats.bhReject(df, "id", "p")
      .select("rejected").as[Boolean].collect().toSeq
    assert(got === Seq(false, false))
  }

  test("fleissKappa matches the hand-computed 3-item 2-rater example") {
    // item1: A,A  item2: A,B  item3: B,B -> S2=10, T=6, r=2, C2=18
    val df = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B")).toDF("item", "cat")
    val got = Stats.fleissKappa(df, "item", "cat")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().head
    val pBar = 4.0 / 6.0
    val pe = 18.0 / 36.0
    assert(got === ((3L, 2L, 10L, 18L, pBar, pe, (pBar - pe) / (1.0 - pe))))
  }

  test("fleissKappa is exactly 1 under perfect agreement") {
    val df = Seq((1L, "A"), (1L, "A"), (1L, "A"),
      (2L, "B"), (2L, "B"), (2L, "B")).toDF("item", "cat")
    val got = Stats.fleissKappa(df, "item", "cat")
      .select("kappa", "n_raters").as[(Double, Long)].collect().head
    assert(got === ((1.0, 3L)))
  }

  test("kruskalWallis matches the tie-free hand example and h_adj = h") {
    // a: 1,3,5  b: 2,4,6 -> R_a=9, R_b=12, H = 150/7 - 21
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L),
      ("b", 2L), ("b", 4L), ("b", 6L)).toDF("g", "v")
    val got = Stats.kruskalWallis(df, "g", "v")
      .as[(Long, Long, Long, Double, Double)].collect().head
    val sq = 0.0 + (18.0 * 18.0) / 12.0 + (24.0 * 24.0) / 12.0
    val h = 12.0 * sq / 42.0 - 3.0 * 7.0
    assert(got === ((2L, 6L, 0L, h, h / 1.0)))
  }

  test("kruskalWallis applies the tie correction via midranks") {
    // a: 1,2,2  b: 2,3 -> 2-midranks 2,6,6 / 6,10; tie block t=3
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val got = Stats.kruskalWallis(df, "g", "v")
      .as[(Long, Long, Long, Double, Double)].collect().head
    val sq = 0.0 + (14.0 * 14.0) / 12.0 + (16.0 * 16.0) / 8.0
    val h = 12.0 * sq / 30.0 - 3.0 * 6.0
    assert(got === ((2L, 5L, 24L, h, h / (1.0 - 24.0 / 120.0))))
  }

  test("calibrationBins: exact integer bin moments, capped top bin") {
    // den=8, bins=4: num 1,1 -> bin 0; num 6,7 -> bin 3 (7*4 div 8 = 3)
    val df = Seq((1L, 0L), (1L, 1L), (7L, 1L), (6L, 0L)).toDF("num", "y")
    val got = Stats.calibrationBins(df, "num", 8L, "y", bins = 4)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 2L, 2.0 / 16.0, 0.5, 0.5 - 2.0 / 16.0),
      (3L, 2L, 1L, 13L, 13.0 / 16.0, 0.5, 0.5 - 13.0 / 16.0)))
  }

  test("calibrationBins caps overflow scores into the last bin") {
    val df = Seq((8L, 1L)).toDF("num", "y") // num = den -> capped to 3
    val got = Stats.calibrationBins(df, "num", 8L, "y", bins = 4)
      .select("bin").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("brierDecomposition matches the hand-computed 4-row example") {
    // den=2: p = 0, 1, .5, .5 vs y = 0, 1, 1, 0 -> brier = 0.125
    val df = Seq((0L, 0L), (2L, 1L), (1L, 1L), (1L, 0L)).toDF("num", "y")
    val got = Stats.brierDecomposition(df, "num", 2L, "y", bins = 2)
      .as[(Long, Double, Double, Double, Double)].collect().head
    val brier = (6.0 - 4.0 * 3.0 + 4.0 * 2.0) / 16.0
    val rel = (0.0 + 0.0 / 4.0 + 0.0 / 12.0) / 4.0
    val res = (0.0 + 4.0 / 16.0 + 4.0 / 48.0) / 4.0
    assert(got === ((4L, brier, rel, res, 4.0 / 16.0)))
  }

  test("acf on an alternating series: exact -5/6, 4/6, -3/6 pattern") {
    val df = (1 to 6).map(i => (i.toLong, if (i % 2 == 1) 1L else -1L))
      .toDF("idx", "x")
    val got = Stats.acf(df, "idx", "x", maxLag = 3)
      .orderBy("lag").as[(Int, Double)].collect().toSeq
    // S = 0 so r_l = N²·XX_l / (N·N·Q): -180/216, 144/216, -108/216
    assert(got === Seq((1, -180.0 / 216.0), (2, 144.0 / 216.0),
      (3, -108.0 / 216.0)))
  }

  test("cramersV is exactly 1 on a perfect association (zero cells count)") {
    // only 2 of the 4 grid cells are observed — the zero cells' expected
    // mass must still contribute, else chi2 = 10 instead of 20
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val got = Stats.cramersV(df, "r", "c")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((20L, 2L, 2L, 20.0, 1.0)))
  }

  test("cramersV is 0 under exact independence") {
    val df = (for (r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 5)
      yield (r, c)).toDF("r", "c")
    val got = Stats.cramersV(df, "r", "c")
      .select("chi2", "v").as[(Double, Double)].collect().head
    assert(got === ((0.0, 0.0)))
  }

  test("kendallTauB: +1 on agreement, -1 on reversal, ties shrink it") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Stats.kendallTauB(up, "x", "y").select("tau_b")
      .as[Double].collect().head === 1.0)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Stats.kendallTauB(down, "x", "y").select("tau_b")
      .as[Double].collect().head === -1.0)
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val got = Stats.kendallTauB(tied, "x", "y")
      .as[(Long, Long, Long, Long, Long, Double)].collect().head
    assert(got === ((3L, 1L, 0L, 1L, 1L, 0.5)))
  }

  test("acf is positional: index gaps do not null out lag pairs") {
    val dense = Seq((1L, 3L), (2L, 5L), (3L, 4L)).toDF("idx", "x")
    val gappy = Seq((10L, 3L), (20L, 5L), (40L, 4L)).toDF("idx", "x")
    val a = Stats.acf(dense, "idx", "x", 1).as[(Int, Double)].collect().head
    val b = Stats.acf(gappy, "idx", "x", 1).as[(Int, Double)].collect().head
    assert(a === b)
  }

  test("mannKendall: exact S, tie-corrected variance, z chain") {
    // series 1,2,2,3 by index: pairs + ties hand-counted
    val df = Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L)).toDF("i", "x")
    val got = Stats.mannKendall(df, "i", "x")
      .as[(Long, Long, Long, Double)].collect().head
    // S = 5 (all up except the 2~2 tie); 18Var = 4*3*13 - 2*1*9 = 138
    val z = (5.0 - 1.0) / math.sqrt(138.0 / 18.0)
    assert(got === ((4L, 5L, 138L, z)))
  }

  test("mannKendall: zero trend gives z = 0 exactly") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("i", "x")
    val got = Stats.mannKendall(df, "i", "x")
      .select("s", "z").as[(Long, Double)].collect().head
    assert(got === ((0L, 0.0)))
  }

  test("mcnemar counts discordant pairs; no discordance gives NULL") {
    val df = (Seq.fill(3)((1L, 1L)) ++ Seq.fill(4)((1L, 0L)) ++
      Seq((0L, 1L)) ++ Seq.fill(2)((0L, 0L))).toDF("a", "b")
    val got = Stats.mcnemar(df, "a", "b")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got === ((10L, 4L, 1L, 9.0 / 5.0, 4.0 / 5.0)))
    val concordant = Seq((1L, 1L), (0L, 0L)).toDF("a", "b")
    val row = Stats.mcnemar(concordant, "a", "b")
      .select("chi2").collect().head
    assert(row.isNullAt(0))
  }

  test("wilcoxonSignedRank: zeros dropped, midranks, exact rank sums") {
    // diffs after the (4,4) zero drop: +1 +1 -1 +2 +3
    // |d|=1 midrank 2 (×3), |d|=2 rank 4, |d|=3 rank 5
    // W+ = 2+2+4+5 = 13, W- = 15-13 = 2, tie = 3³-3 = 24
    val df = Seq((5L, 4L), (7L, 6L), (3L, 4L), (6L, 4L), (9L, 6L),
      (4L, 4L)).toDF("x", "y")
    val got = Stats.wilcoxonSignedRank(df, "x", "y")
      .as[(Long, Double, Double, Double)].collect().head
    val z = (2.0 * 26 - 30) / (2.0 * math.sqrt((660.0 - 24) / 12.0))
    assert(got === ((5L, 13.0, 2.0, z)))
  }

  test("friedman: exact rank-sum statistic; incomplete block nulls it") {
    val df = Seq(
      (1L, "A", 1L), (1L, "B", 2L), (1L, "C", 3L),
      (2L, "A", 2L), (2L, "B", 3L), (2L, "C", 1L),
      (3L, "A", 1L), (3L, "B", 3L), (3L, "C", 2L)).toDF("blk", "trt", "x")
    val got = Stats.friedman(df, "blk", "trt", "x")
      .as[(Long, Long, Long, Double, Double)].collect().head
    // rank sums A=4 B=8 C=6: chi2 = 12*116/(3*3*4) - 3*3*4
    val chi2 = 12.0 * (16.0 + 64.0 + 36.0) / 36.0 - 36.0
    assert(got === ((3L, 3L, 0L, chi2, chi2)))
    val ragged = df.union(Seq((4L, "A", 9L)).toDF("blk", "trt", "x"))
    val row = Stats.friedman(ragged, "blk", "trt", "x")
      .select("chi2_f").collect().head
    assert(row.isNullAt(0))
  }

  test("cochranQ: exact integer moments; incomplete block nulls it") {
    // 4 blocks × 3 treatments, binary: C = (3,2,1), R = (3,2,1,0)
    // Q = 2*(3*14 - 36)/(3*6 - 14) = 12/4 = 3
    val df = Seq(
      (1L, "a", 1L), (1L, "b", 1L), (1L, "c", 1L),
      (2L, "a", 1L), (2L, "b", 1L), (2L, "c", 0L),
      (3L, "a", 1L), (3L, "b", 0L), (3L, "c", 0L),
      (4L, "a", 0L), (4L, "b", 0L), (4L, "c", 0L)).toDF("blk", "trt", "y")
    val got = Stats.cochranQ(df, "blk", "trt", "y")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((4L, 3L, 6L, 3.0)))
    val ragged = df.union(Seq((5L, "a", 1L)).toDF("blk", "trt", "y"))
    assert(Stats.cochranQ(ragged, "blk", "trt", "y")
      .select("q").collect().head.isNullAt(0))
  }

  test("cochranQ: all-constant blocks make the denominator 0 → NULL") {
    val df = Seq((1L, "a", 1L), (1L, "b", 1L), (2L, "a", 0L),
      (2L, "b", 0L)).toDF("blk", "trt", "y")
    assert(Stats.cochranQ(df, "blk", "trt", "y")
      .select("q").collect().head.isNullAt(0))
  }

  test("cronbachAlpha: duplicated items give alpha = 1 exactly") {
    val df = (1L to 3L).flatMap(j => Seq((j, "a", j), (j, "b", j)))
      .toDF("blk", "it", "x")
    val got = Stats.cronbachAlpha(df, "blk", "it", "x")
      .as[(Long, Long, Double)].collect().head
    assert(got === ((3L, 2L, 1.0)))
    val ragged = df.union(Seq((4L, "a", 9L)).toDF("blk", "it", "x"))
    assert(Stats.cronbachAlpha(ragged, "blk", "it", "x")
      .select("alpha").collect().head.isNullAt(0))
  }

  test("icc1: perfect within-subject agreement gives ICC = 1") {
    val df = (1L to 3L).flatMap(j => Seq((j, "a", j), (j, "b", j)))
      .toDF("blk", "it", "x")
    val got = Stats.icc1(df, "blk", "it", "x")
      .as[(Long, Long, Double)].collect().head
    assert(got === ((3L, 2L, 1.0)))
  }

  test("pettitt: the level shift is located exactly") {
    // [1,1,1,5,5]: U = [-2,-4,-6,-3,0] -> K=6 at t=3
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L))
      .toDF("i", "x")
    val got = Stats.pettitt(df, "i", "x")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((5L, 6L, 3L, -6L)))
  }

  test("ljungBox folds the exact acf chain in lag order") {
    // [1,2,1]: r1 = -4/6, Q = 3*5*(r^2/2)
    val df = Seq((1L, 1L), (2L, 2L), (3L, 1L)).toDF("i", "x")
    val got = Stats.ljungBox(df, "i", "x", maxLag = 1)
      .as[(Long, Long, Double)].collect().head
    val r = (9.0 * 4 - 3.0 * 4 * 6 + 2.0 * 16) / (3.0 * (3 * 6 - 16))
    assert(got === ((3L, 1L, 3.0 * 5.0 * (0.0 + r * r / 2.0))))
  }

  test("brownForsythe: identical spreads around group medians give W=0") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 11L), ("b", 12L), ("b", 13L)).toDF("g", "v")
    val got = Stats.brownForsythe(df, "g", "v")
      .select("k", "n", "ss_between", "w")
      .as[(Long, Long, Double, Double)].collect().head
    assert(got === ((2L, 6L, 0.0, 0.0)))
  }

  test("moodsMedian: global-median census with equal values dropped") {
    // median 2 dropped; a=[1] below, b=[3,4] above
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val got = Stats.moodsMedian(df, "g", "v")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val chi2 = 0.0 + (4.0 / 6.0 + 4.0 / 3.0) + (4.0 / 12.0 + 4.0 / 6.0)
    assert(got === ((2L, 3L, 2L, 1L, chi2)))
  }

  test("jonckheereTerpstra: perfect ordered separation, exact moments") {
    // a=[1,2] < b=[3,4] < c=[5,6]: JT* = 12, N=6
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 5L), ("c", 6L)).toDF("g", "v")
    val got = Stats.jonckheereTerpstra(df, "g", "v", Seq("a", "b", "c"))
      .as[(Long, Double, Double)].collect().head
    val z = (2.0 * 24 - 24.0) / math.sqrt(2.0 * 456 / 9.0)
    assert(got === ((6L, 12.0, z)))
    val row = Stats.jonckheereTerpstra(df, "g", "v", Seq("a", "b"))
      .select("z").collect().head
    assert(row.isNullAt(0))
  }

  test("cliffsDelta counts census pairs exactly, ties excluded") {
    val df = Seq(("p", 3L), ("p", 4L), ("c", 1L), ("c", 4L))
      .toDF("g", "v")
    val got = Stats.cliffsDelta(df, "g", "v", "p", "c")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((2L, 1L, 4L, 0.25)))
  }

  test("cohensD: exact pooled variance; tiny groups give NULL") {
    // a=[1,3], b=[5,9]: sp^2 = 5, d = -5/sqrt(5)
    val df = Seq(("p", 1L), ("p", 3L), ("c", 5L), ("c", 9L))
      .toDF("g", "v")
    val got = Stats.cohensD(df, "g", "v", "p", "c")
      .as[(Long, Long, Double, Double)].collect().head
    val d = -5.0 / math.sqrt(5.0)
    assert(got === ((2L, 2L, d, d * (1.0 - 3.0 / 7.0))))
    val tiny = Seq(("p", 1L), ("c", 2L)).toDF("g", "v")
    assert(Stats.cohensD(tiny, "g", "v", "p", "c")
      .select("d").collect().head.isNullAt(0))
  }

  test("runsTest: median-equal rows dropped, exact run census") {
    // sorted 1,1,2,2,9,10 -> lower median 2 (dropped); kept signs
    // below,above,above,below -> r=3, n1=n2=2, z = 0 exactly
    val df = Seq((1L, 1L), (2L, 2L), (3L, 9L), (4L, 10L), (5L, 1L),
      (6L, 2L)).toDF("i", "v")
    val got = Stats.runsTest(df, "i", "v")
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((2L, 2L, 3L, 0.0)))
    val oneSided = Seq((1L, 1L), (2L, 1L), (3L, 5L)).toDF("i", "v")
    assert(Stats.runsTest(oneSided, "i", "v")
      .select("z").collect().head.isNullAt(0))
  }

  test("durbinWatson: exact scaled residuals; perfect fit gives NULL") {
    // y = [1,3,2]: e_scaled = [-9,18,-9], dw = 1458/486 = 3
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("i", "y")
    val got = Stats.durbinWatson(df, "i", "y")
      .as[(Long, Double)].collect().head
    assert(got === ((3L, 3.0)))
    val line = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("i", "y")
    assert(Stats.durbinWatson(line, "i", "y")
      .select("dw").collect().head.isNullAt(0))
  }

  test("siegelSlopes resists two outliers where the data is a line") {
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L), (5L, 100L))
      .toDF("i", "x")
    val got = Stats.siegelSlopes(df, "i", "x")
      .as[(Long, Double, Double)].collect().head
    assert(got === ((5L, 2.0, 0.0)))
  }

  test("cuped: a perfect covariate reduces nothing it shouldn't") {
    // y = 2x + 10*(g=a): theta = 2, raw diff = adjusted diff = 10
    val df = (1L to 3L).flatMap(x =>
      Seq(("a", x, 2 * x + 10), ("b", x, 2 * x))).toDF("g", "x", "y")
    val got = Stats.cuped(df, "g", "x", "y")
      .as[(String, String, Long, Long, Double, Double, Double)]
      .collect().head
    assert(got === (("a", "b", 3L, 3L, 2.0, 10.0, 10.0)))
    val three = df.union(Seq(("c", 1L, 1L)).toDF("g", "x", "y"))
    val row = Stats.cuped(three, "g", "x", "y")
      .select("theta", "diff_adj").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1))
  }

  test("hodgesLehmann selects the lower-median Walsh average") {
    // sums of (1,3,5) pairs i<=j: 2,4,6,6,8,10 -> median 6 -> 3.0
    val df = Seq((1L, 1L), (2L, 3L), (3L, 5L)).toDF("i", "x")
    val got = Stats.hodgesLehmann(df, "i", "x")
      .as[(Long, Double)].collect().head
    assert(got === ((6L, 3.0)))
  }

  test("pageTrend: exact L on a perfect trend; unmapped treatment nulls z") {
    // 3 blocks, values follow the hypothesized A<B<C order exactly:
    // R = (3,6,9), L = 42, mu = 36, sigma^2 = 6
    val df = (1L to 3L).flatMap(b =>
      Seq((b, "A", 1L), (b, "B", 2L), (b, "C", 3L))).toDF("blk", "trt", "x")
    val got = Stats.pageTrend(df, "blk", "trt", "x", Seq("A", "B", "C"))
      .as[(Long, Long, Double, Double)].collect().head
    val z = (2.0 * 84 - 144.0) / math.sqrt(3.0 * 9 * 16 * 2 / 9.0)
    assert(got === ((3L, 3L, 42.0, z)))
    val row = Stats.pageTrend(df, "blk", "trt", "x", Seq("A", "B"))
      .select("z").collect().head
    assert(row.isNullAt(0))
  }

  test("randomizationTest: constant values make every replicate extreme") {
    val df = (1L to 40L).map(i => (if (i % 2 == 0) "a" else "b", 5L,
      i.toString)).toDF("g", "v", "seed")
    val got = Stats.randomizationTest(df, "g", "v", "seed", 50)
      .as[(Long, Long, Long, Double, Long, Double)].collect().head
    assert(got === ((50L, 20L, 20L, 0.0, 50L, 1.0)))
    val three = Seq(("a", 1L, "1"), ("b", 2L, "2"), ("c", 3L, "3"))
      .toDF("g", "v", "seed")
    intercept[IllegalArgumentException] {
      Stats.randomizationTest(three, "g", "v", "seed", 10)
    }
  }

  test("isotonicFit pools violators to level-set means") {
    // classic 1,3,2,4: the (3,2) violation pools to 2.5
    val df = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("i", "y")
    val got = Stats.isotonicFit(df, "i", "y")
      .orderBy("i").as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1L, 1.0), (2L, 3L, 2.5), (3L, 2L, 2.5),
      (4L, 4L, 4.0)))
  }

  test("isotonicFit pools a fully decreasing series to one mean") {
    val df = Seq((1L, 9L), (2L, 6L), (3L, 3L)).toDF("i", "y")
    val got = Stats.isotonicFit(df, "i", "y")
      .orderBy("i").select("yhat").as[Double].collect().toSeq
    assert(got === Seq(6.0, 6.0, 6.0))
    val inc = Seq((1L, 1L), (2L, 2L)).toDF("i", "y") // no violations
    assert(Stats.isotonicFit(inc, "i", "y").orderBy("i")
      .select("yhat").as[Double].collect().toSeq === Seq(1.0, 2.0))
  }

  test("isotonicFitByKey pools each key independently and matches " +
    "isotonicFit key-for-key") {
    // key 1 is the classic 1,3,2,4; key 2 is fully decreasing; the
    // boundary rows (key 1's 4 vs key 2's 9) must NOT pool across keys
    val df = Seq((1L, 1L, 1L), (1L, 2L, 3L), (1L, 3L, 2L), (1L, 4L, 4L),
      (2L, 1L, 9L), (2L, 2L, 6L), (2L, 3L, 3L))
      .toDF("k", "i", "y")
    val got = Stats.isotonicFitByKey(df, "k", "i", "y")
      .orderBy("k", "i").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 1L, 1L, 1.0), (1L, 2L, 3L, 2.5),
      (1L, 3L, 2L, 2.5), (1L, 4L, 4L, 4.0),
      (2L, 1L, 9L, 6.0), (2L, 2L, 6L, 6.0), (2L, 3L, 3L, 6.0)))
    // identity with the single-series face, per key
    for (k <- Seq(1L, 2L)) {
      val single = Stats.isotonicFit(df.filter($"k" === k), "i", "y")
        .orderBy("i").as[(Long, Long, Double)].collect().toSeq
      assert(got.filter(_._1 == k).map(t => (t._2, t._3, t._4)) === single)
    }
  }

  test("theilSen recovers an exact line and resists one outlier") {
    val line = Seq((1L, 10L), (2L, 13L), (3L, 16L), (4L, 19L), (5L, 22L))
      .toDF("i", "x")
    val gl = Stats.theilSen(line, "i", "x")
      .as[(Long, Long, Double, Double)].collect().head
    assert(gl === ((5L, 10L, 3.0, 7.0)))
    val outlier = Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L), (5L, 100L))
      .toDF("i", "x")
    val go = Stats.theilSen(outlier, "i", "x")
      .as[(Long, Long, Double, Double)].collect().head
    assert(go._3 === 2.0 && go._4 === 0.0) // median slope ignores the spike
  }
}
