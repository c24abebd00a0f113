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
}
