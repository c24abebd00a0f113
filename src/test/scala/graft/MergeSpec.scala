package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 0, false), // untouched
    (2L, "b", 0, false), // beaten by version 1
    (3L, "c", 5, false), // base version HIGHER than update -> base wins
    (4L, "d", 0, false), // version tie -> updates side wins
    (5L, "e", 0, false)  // tombstoned
  ).toDF("k", "v", "version", "deleted")

  private def upd = Seq(
    (2L, "B", 1, false),
    (3L, "C", 1, false),
    (4L, "D", 0, false),
    (5L, "E", 1, true),
    (6L, "F", 0, false)  // brand-new key inserts
  ).toDF("k", "v", "version", "deleted")

  test("mergeLatest: version wins, ties prefer updates, tombstones drop, " +
       "new keys insert") {
    val got = Merge.mergeLatest(base, upd, Seq("k"), "version",
        deleteCol = Some("deleted"))
      .select("k", "v", "version").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a", 0), // untouched base row
      (2L, "B", 1), // higher version
      (3L, "c", 5), // base outversions the update
      (4L, "D", 0), // tie -> updates side
      (6L, "F", 0)  // insert; 5 tombstoned away
    ))
  }

  test("mergeLatest: without deleteCol tombstone rows pass through") {
    val got = Merge.mergeLatest(base, upd, Seq("k"), "version")
      .filter($"k" === 5L).select("v", "deleted")
      .as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("E", true)))
  }

  test("mergeLatest: one partial-aggregating shuffle, no window") {
    val merged = Merge.mergeLatest(base, upd, Seq("k"), "version")
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window:\n$plan")
    val exchanges = plan.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(exchanges == 1, s"expected one shuffle:\n$plan")
    // map-side truncation: a partial max_by aggregate before the exchange
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby")
      || plan.toLowerCase.contains("max_by"), s"expected max_by agg:\n$plan")
  }

  test("mergeAggregates: merged base+delta equals the direct aggregate " +
    "over the union, per combiner") {
    val raw1 = Seq(("a", 1L, 10L), ("a", 2L, 5L), ("b", 3L, 7L))
      .toDF("k", "x", "y")
    val raw2 = Seq(("a", 4L, 20L), ("c", 5L, 1L)).toDF("k", "x", "y")
    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("sx"),
        min("y").as("mn"), max("y").as("mx"))
    val merged = Merge.mergeAggregates(aggOf(raw1), aggOf(raw2), Seq("k"),
        Seq("n" -> "sum", "sx" -> "sum", "mn" -> "min", "mx" -> "max"))
      .orderBy("k").collect()
    val direct = aggOf(raw1.unionByName(raw2)).orderBy("k").collect()
    assert(merged.toSeq == direct.toSeq)
    // closed form for the overlapping key
    val a = merged(0)
    assert(a.getString(0) == "a" && a.getLong(1) == 3L &&
      a.getLong(2) == 7L && a.getLong(3) == 5L && a.getLong(4) == 20L)
    // delta-only key appears; base-only key survives untouched
    assert(merged.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
  }

  test("mergeLatest is idempotent and associative over generated update " +
    "batches (property)") {
    import org.scalacheck.Gen
    val row = for {
      k <- Gen.choose(1L, 12L); v <- Gen.alphaStr.map(_.take(4))
      ver <- Gen.choose(0, 5); del <- Gen.oneOf(true, false, false, false)
    } yield (k, v, ver, del)
    // unique (key, version) within a batch — the documented CDC contract
    def batch(): Seq[(Long, String, Int, Boolean)] =
      Iterator.continually(Gen.listOf(row).sample).flatten.next()
        .groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
    def df(rs: Seq[(Long, String, Int, Boolean)]) =
      rs.toDF("k", "v", "version", "deleted")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().toSeq
    for (_ <- 1 to 5) {
      val (b0, u1, u2) = (batch(), batch(), batch())
      val once = Merge.mergeLatest(df(b0), df(u1), Seq("k"), "version",
        deleteCol = Some("deleted"))
      // idempotent: re-applying the same updates changes nothing
      // (tombstoned keys revive only if u1 carries a same-version
      // non-deleted row — impossible: (k, version) is unique in u1;
      // but the tombstone ROW ITSELF is gone from `once`, so replaying
      // u1 can re-surface a dropped key. Compare against base∪u1
      // re-merged instead: merge(merge(b,u1),u1) == merge-with-rows-kept)
      val keepDeletes = Merge.mergeLatest(df(b0), df(u1), Seq("k"), "version")
      val replay = Merge.mergeLatest(keepDeletes, df(u1), Seq("k"), "version")
      assert(canon(replay) == canon(keepDeletes), "idempotence (rows kept)")
      // associativity on the rows-kept form: (b+u1)+u2 == b+(u1+u2) needs
      // u1/u2 conflict resolution to match pairwise merge — guaranteed by
      // the same ordering rule, EXCEPT ties across u1/u2 (u2 wins in both
      // groupings). Spot-check equality:
      val lhs = Merge.mergeLatest(keepDeletes, df(u2), Seq("k"), "version")
      val u12 = Merge.mergeLatest(df(u1), df(u2), Seq("k"), "version")
      val rhs = Merge.mergeLatest(df(b0), u12, Seq("k"), "version")
      assert(canon(lhs).map(r => (r.getLong(0), r.getInt(2))) ==
        canon(rhs).map(r => (r.getLong(0), r.getInt(2))),
        "associativity of surviving (key, version)")
    }
  }

  test("mergeAggregates is associative and order-insensitive over " +
    "generated deltas (property)") {
    import org.scalacheck.Gen
    val row = for {
      k <- Gen.oneOf("a", "b", "c"); x <- Gen.choose(-50L, 50L)
      y <- Gen.choose(0L, 99L)
    } yield (k, x, y)
    def agg(rs: Seq[(String, Long, Long)]) =
      rs.toDF("k", "x", "y").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          min("y").as("mn"), max("y").as("mx"))
    val spec = Seq("n" -> "sum", "sx" -> "sum", "mn" -> "min", "mx" -> "max")
    def m(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Merge.mergeAggregates(a, b, Seq("k"), spec)
    def canon(d: org.apache.spark.sql.DataFrame) = d.orderBy("k").collect().toSeq
    for (_ <- 1 to 5) {
      val parts = Seq.fill(3)(
        Iterator.continually(Gen.nonEmptyListOf(row).sample).flatten.next())
      val Seq(a, b, c) = parts.map(agg)
      assert(canon(m(m(a, b), c)) == canon(m(a, m(b, c))), "associative")
      assert(canon(m(a, b)) == canon(m(b, a)), "commutative")
      assert(canon(m(m(a, b), c)) == canon(agg(parts.flatten)),
        "equals the direct aggregate of all raw rows")
    }
  }

  test("mergeAggregates: unknown combiner and mismatched schemas are " +
    "rejected") {
    val t1 = Seq(("a", 1L)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      Merge.mergeAggregates(t1, t1, Seq("k"), Seq("x" -> "avg"))
    }
    intercept[IllegalArgumentException] {
      Merge.mergeAggregates(t1, Seq(("a", 1L)).toDF("k", "z"), Seq("k"),
        Seq("x" -> "sum"))
    }
  }

  test("mergeLatest: mismatched schemas are rejected") {
    intercept[IllegalArgumentException] {
      Merge.mergeLatest(base, upd.drop("deleted"), Seq("k"), "version")
    }
  }
}
