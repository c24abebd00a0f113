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

  test("mergeLatest: mismatched schemas are rejected") {
    intercept[IllegalArgumentException] {
      Merge.mergeLatest(base, upd.drop("deleted"), Seq("k"), "version")
    }
  }
}
