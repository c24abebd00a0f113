package graft

import org.apache.spark.sql.functions.col
import graft.operators.Assoc

class AssocSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {a,b,c}, {a,b}, {a,d}, {b} -> n = 4
  private def tx = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "d"),
    (4L, "b"), (4L, "b") // duplicate collapses (set semantics)
  ).toDF("basket", "item")

  test("associationRules: exact counts and single-division ratios") {
    val got = Assoc.associationRules(tx).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    // a&b co-occur in baskets 1,2; c(a)=3, c(b)=3, n=4
    assert(got(("a", "b")) ==
      ((2L, 3L, 3L, 4L, 2.0 / 4.0, 2.0 / 3.0, (2.0 * 4.0) / (3.0 * 3.0))))
    // rules are directional: both orders present with their own conf
    assert(got(("b", "a"))._6 == 2.0 / 3.0)
    // a&c co-occur once; a&d once; c&d never
    assert(got(("a", "c"))._1 == 1L)
    assert(!got.contains(("c", "d")))
  }

  test("associationRules: minPairCount floors and maxBasketSize drops " +
    "mega-baskets before the quadratic join") {
    val floored = Assoc.associationRules(tx, minPairCount = 2L)
      .select("antecedent", "consequent").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored == Set(("a", "b"), ("b", "a")))
    // a 3-item mega-basket excluded at maxBasketSize = 2: only the
    // pairs of 2-item baskets survive, and n_baskets shrinks with it
    val guarded = Assoc.associationRules(tx, maxBasketSize = 2)
    val rows = guarded.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap
    assert(!rows.keySet.exists { case (x, y) => Set(x, y) == Set("a", "c") })
    assert(rows(("a", "b")) == ((1L, 3L))) // only basket 2; n = 3
  }

  test("itemItemCosine ranks neighbours by exact-bits cosine") {
    // baskets {a,b} {a,b} {a,c}: n_a=3 n_b=2 n_c=1; c(a,b)=2 c(a,c)=1
    val tx2 = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("basket", "item")
    val got = Assoc.itemItemCosine(tx2, k = 2, minPairCount = 1L)
      .orderBy("item", "rk")
      .as[(String, String, Long, Long, Long, Double, Int)]
      .collect().toSeq
    val a = got.filter(_._1 == "a")
    assert(a.map(r => (r._2, r._3, r._7)) === Seq(("b", 2L, 1), ("c", 1L, 2)))
    assert(a.head._6 === 2.0 / math.sqrt(6.0))
    // symmetric faces exist for b and c with the same exact counts
    assert(got.filter(_._1 == "b").map(_._2) === Seq("a"))
    assert(got.filter(_._1 == "c").head._6 === 1.0 / math.sqrt(3.0))
  }

  test("itemItemCosine floors pairs at minPairCount") {
    val tx2 = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("basket", "item")
    val got = Assoc.itemItemCosine(tx2, k = 2, minPairCount = 2L)
      .as[(String, String, Long, Long, Long, Double, Int)]
      .collect().toSeq
    assert(got.map(r => (r._1, r._2)).toSet === Set("a" -> "b", "b" -> "a"))
  }
}
