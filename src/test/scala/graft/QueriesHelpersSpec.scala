package graft

import org.apache.spark.sql.functions._

/** Pins the r14 gate-mechanics optimizations to the semantics they
  * replaced: [[Queries.sameRows]] must decide EXACTLY the predicate
  * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` (multiset row
  * equality under null-safe, NaN-normalizing grouping) that the parity
  * gates asserted before the one-job rewrite. */
class QueriesHelpersSpec extends SparkSpec {
  import spark.implicits._

  private def bothWays(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("sameRows agrees with two-way exceptAll emptiness on equal multisets") {
    val a = Seq((1L, 2L, 0.5, 1), (1L, 3L, 0.4, 2), (2L, 1L, 0.9, 1),
      (1L, 2L, 0.5, 1)).toDF("query_id", "nbr_id", "cos", "rank")
    val b = Seq((1L, 3L, 0.4, 2), (1L, 2L, 0.5, 1), (2L, 1L, 0.9, 1),
      (1L, 2L, 0.5, 1)).toDF("query_id", "nbr_id", "cos", "rank")
    assert(bothWays(a, b))
    assert(Queries.sameRows(a, b))
  }

  test("sameRows rejects a multiplicity difference both directions") {
    val a = Seq((1L, 2L, 0.5), (1L, 2L, 0.5), (2L, 1L, 0.9))
      .toDF("query_id", "nbr_id", "cos")
    val dupDropped = Seq((1L, 2L, 0.5), (2L, 1L, 0.9))
      .toDF("query_id", "nbr_id", "cos")
    assert(!bothWays(a, dupDropped) && !Queries.sameRows(a, dupDropped))
    assert(!bothWays(dupDropped, a) && !Queries.sameRows(dupDropped, a))
    // superset in one direction only: two-way still false, sameRows too
    val extra = a.unionByName(Seq((9L, 9L, 0.1))
      .toDF("query_id", "nbr_id", "cos"))
    assert(!bothWays(a, extra) && !Queries.sameRows(a, extra))
  }

  test("sameRows matches exceptAll's null and special-double handling") {
    val a = Seq[(java.lang.Long, java.lang.Double)]((1L, null),
      (null, 0.0), (2L, Double.NaN)).toDF("id", "x")
    val b = Seq[(java.lang.Long, java.lang.Double)]((null, -0.0),
      (2L, Double.NaN), (1L, null)).toDF("id", "x")
    // exceptAll groups null==null, NaN==NaN, 0.0==-0.0; sameRows must too
    assert(bothWays(a, b))
    assert(Queries.sameRows(a, b))
    val c = Seq[(java.lang.Long, java.lang.Double)]((1L, null),
      (null, 1.0), (2L, Double.NaN)).toDF("id", "x")
    assert(!bothWays(a, c) && !Queries.sameRows(a, c))
  }

  test("sameRows handles empty frames like two-way exceptAll") {
    val a = Seq((1L, 0.5)).toDF("id", "x")
    val empty = a.limit(0)
    assert(bothWays(empty, empty) && Queries.sameRows(empty, empty))
    assert(!bothWays(a, empty) && !Queries.sameRows(a, empty))
    assert(!bothWays(empty, a) && !Queries.sameRows(empty, a))
  }
}
