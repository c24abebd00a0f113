package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket association-rule mining over (basket, item) pairs —
 * the co-occurrence statistics (support / confidence / lift) behind
 * "users who X also Y", prompt-template co-occurrence analysis, and
 * tag-correlation audits of a training corpus.
 */
object Assoc {

  /** Pairwise association rules: for every DIRECTED item pair (a, c)
    * co-occurring in ≥ `minPairCount` baskets, emit the exact BIGINT
    * counts (c_pair, c_ante, c_cons, n_baskets) plus
    * support = c_pair/n, confidence = c_pair/c_ante and
    * lift = c_pair·n/(c_ante·c_cons) — each ONE fixed IEEE expression
    * over exact integers, so the q144 gate hash-replays bit-identically.
    * Items dedupe within a basket first (set semantics, the standard
    * convention).
    *
    * Shape at 100 TB: the within-basket self-join emits
    * sz·(sz−1) rows per basket — quadratic in basket SIZE, not count —
    * so `maxBasketSize` drops degenerate mega-baskets BEFORE the join
    * (the [[GraphAlgos.bipartiteProject]] guard: a basket holding half
    * the catalog is load, not signal). Everything else is
    * map-side-combined counts; the n_baskets scalar rides a broadcast
    * cross join, never a driver collect. */
  def associationRules(tx: DataFrame, basketCol: String = "basket",
      itemCol: String = "item", minPairCount: Long = 1L,
      maxBasketSize: Int = 256): DataFrame = {
    require(minPairCount >= 1, "minPairCount must be >= 1")
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    val b0 = tx.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val keep = b0.groupBy("basket").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select("basket")
    val b = b0.join(keep, Seq("basket"), "left_semi")
    Exec.withPersisted(b) {
      val nDf = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val items = b.groupBy("item").agg(count(lit(1)).as("c"))
      val pairs = b
        .join(b.select(col("basket"), col("item").as("item2")), "basket")
        .filter(col("item") =!= col("item2"))
        .groupBy(col("item").as("antecedent"), col("item2").as("consequent"))
        .agg(count(lit(1)).as("c_pair"))
        .filter(col("c_pair") >= minPairCount)
      pairs
        .join(items.select(col("item").as("antecedent"),
          col("c").as("c_ante")), "antecedent")
        .join(items.select(col("item").as("consequent"),
          col("c").as("c_cons")), "consequent")
        .crossJoin(broadcast(nDf))
        .select(col("antecedent"), col("consequent"), col("c_pair"),
          col("c_ante"), col("c_cons"), col("n_baskets"),
          (col("c_pair").cast("double") / col("n_baskets").cast("double"))
            .as("support"),
          (col("c_pair").cast("double") / col("c_ante").cast("double"))
            .as("confidence"),
          ((col("c_pair").cast("double") * col("n_baskets").cast("double")) /
            (col("c_ante").cast("double") * col("c_cons").cast("double")))
            .as("lift"))
    }
  }

  /** Item-item collaborative filtering: top-`k` neighbours per item by
    * co-occurrence cosine c_ij/√(n_i·n_j) over (basket, item) pairs —
    * the classic "users who X also Y" recommender precompute.
    *
    * Numerics: counts are exact BIGINTs; n_i·n_j < 2^53 converts to
    * double exactly, √ is correctly rounded, so the cosine is ONE
    * fixed IEEE chain both engines reproduce bit-for-bit; the top-k
    * window orders by (cosine DESC, neighbour) on those identical
    * bits. Scale shape: same within-basket self-join as
    * [[associationRules]] (quadratic in basket SIZE, `maxBasketSize`
    * guards mega-baskets), then everything is item-keyed counts; the
    * per-item top-k is a window over |items| partitions. */
  def itemItemCosine(tx: DataFrame, basketCol: String = "basket",
      itemCol: String = "item", k: Int = 3,
      minPairCount: Long = 2L, maxBasketSize: Int = 256): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val b0 = tx.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val keep = b0.groupBy("basket").agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") <= maxBasketSize)
      .select("basket")
    val b = b0.join(keep, Seq("basket"), "left_semi")
    Exec.withPersisted(b) {
      val items = b.groupBy("item").agg(count(lit(1)).as("n"))
      val pairs = b
        .join(b.select(col("basket"), col("item").as("nbr")), "basket")
        .filter(col("item") =!= col("nbr"))
        .groupBy("item", "nbr")
        .agg(count(lit(1)).as("c_pair"))
        .filter(col("c_pair") >= minPairCount)
      val scored = pairs
        .join(items.select(col("item"), col("n").as("n_item")), "item")
        .join(items.select(col("item").as("nbr"), col("n").as("n_nbr")),
          "nbr")
        .withColumn("cosine", col("c_pair").cast("double") /
          sqrt((col("n_item") * col("n_nbr")).cast("double")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("item"))
        .orderBy(col("cosine").desc, col("nbr"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select("item", "nbr", "c_pair", "n_item", "n_nbr", "cosine", "rk")
    }
  }
}
