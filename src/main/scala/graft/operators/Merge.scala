package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC-style row-level merge — the incremental-maintenance counterpart to
 * the reference's whole-recompute graph sink (SURVEY §2.1 S12: the
 * reference's ResultsGraphBuilder re-derives and overwrites collections;
 * at 100 TB a changed 0.1% must not rewrite the other 99.9%'s lineage).
 *
 * [[mergeLatest]] implements MERGE/upsert-by-key semantics: base ∪
 * updates, highest `versionCol` per key wins, ties prefer the updates
 * side, winners carrying a true `deleteCol` (tombstones) drop out.
 */
object Merge {

  /** Latest-wins merge of `updates` into `base` on `keys`.
    *
    * Both sides must share a schema. Per key the row with the highest
    * `versionCol` survives; on version ties the UPDATES side wins (the
    * CDC convention: a replayed same-version row is a correction).
    * Precondition: (keys, version) is unique WITHIN each side — the
    * standard CDC contract; two distinct same-key-same-version rows on
    * one side would make the survivor partitioning-dependent.
    *
    * `deleteCol` names an optional boolean tombstone column: when the
    * winning row has it true, the key disappears from the output
    * (the column itself is passed through unchanged for downstream
    * sinks that need to propagate deletes).
    *
    * Shape at 100 TB: ONE hash shuffle on the keys with full partial
    * aggregation — `max_by(row-struct, (version, side))` truncates to
    * one candidate per key per map task BEFORE the exchange, so the
    * shuffle carries ~|keys| rows, not |base| + |updates| (the window
    * row_number formulation ships everything). Updates are typically
    * ≪ base: with a bucketed/pre-partitioned base table the shuffle
    * drops to the updates side only (see [[Scale.writeBucketed]]). */
  def mergeLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
                  versionCol: String,
                  deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    require(!base.columns.contains("__side"),
      "column name __side is reserved by mergeLatest")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas differ: base ${base.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    val cols = base.columns.toSeq
    val tagged = base.withColumn("__side", lit(0))
      .unionByName(updates.withColumn("__side", lit(1)))
    val winner = tagged.groupBy(keys.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(versionCol), col("__side"))).as("__row"))
      .select(col("__row.*"))
    deleteCol.map(d => winner.filter(!coalesce(col(d), lit(false))))
      .getOrElse(winner)
  }

  /** Monoid merge of aggregate tables — the incremental-view-maintenance
    * counterpart to [[mergeLatest]]: `base` holds per-key aggregates of
    * everything seen so far, `delta` the same aggregates over new data
    * only; the merge re-combines per key so the result EQUALS the
    * aggregate over the union of the raw inputs, without re-reading the
    * base's raw data. `merge` lists (column → combiner) in output
    * order; combiners are the re-aggregatable monoids `sum` (also the
    * combiner for counts: counts add), `min`, `max`. Non-monoid
    * metrics (avg, ratios) must be carried as their monoid parts
    * (sum + count) and derived after the merge.
    *
    * Shape at 100 TB: one partial-aggregated shuffle over base ∪ delta —
    * both sides are already key-cardinality (not data-cardinality)
    * tables, and with a bucketed base the exchange drops to the delta
    * side only. */
  def mergeAggregates(base: DataFrame, delta: DataFrame, keys: Seq[String],
                      merge: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    require(base.columns.toSeq == delta.columns.toSeq,
      s"schemas differ: base ${base.columns.mkString(",")} vs " +
        s"delta ${delta.columns.mkString(",")}")
    require(merge.nonEmpty, "need at least one aggregate column")
    val exprs = merge.map {
      case (c, "sum") => sum(col(c)).as(c)
      case (c, "min") => min(col(c)).as(c)
      case (c, "max") => max(col(c)).as(c)
      case (c, how) =>
        throw new IllegalArgumentException(
          s"column $c: unknown combiner '$how' (sum|min|max)")
    }
    base.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }
}
