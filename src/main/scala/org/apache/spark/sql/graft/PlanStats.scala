package org.apache.spark.sql
package graft

import org.apache.spark.sql.execution.LogicalRDD

/** Statistics hygiene for iterative checkpointed loops.
  *
  * `Dataset.localCheckpoint(eager = true)` truncates LINEAGE but
  * deliberately carries the origin plan's `Statistics` onto the new
  * `LogicalRDD` (SPARK-39748). Catalyst's size-only estimator computes a
  * join's sizeInBytes as the PRODUCT of its children's, so in a peel loop
  * whose round-N leaves are round-N−1 checkpoints the estimate's BigInt
  * digit count grows geometrically (≈ ×joins-per-round each round):
  * by round ~10 the optimizer is multiplying million-digit BigIntegers on
  * the driver and planning time dwarfs execution (measured: the
  * decremental k-truss peel spent 20+ min INSIDE
  * SizeInBytesOnlyStatsPlanVisitor at gate scale; the recount face paid
  * seconds of the same tax in its tail rounds).
  *
  * [[dropStats]] rebuilds the checkpointed frame's LogicalRDD WITHOUT the
  * origin stats (falling back to `spark.sql.defaultSizeInBytes`, exactly
  * as a pre-SPARK-39748 checkpoint behaved), keeping output partitioning
  * and ordering. The same persisted RDD stays the leaf, so
  * `Exec.releaseCheckpoint` on the returned frame still frees the blocks.
  * Loops should prefer `Exec.checkpointCut` over calling this directly.
  */
object PlanStats {
  def dropStats(ck: DataFrame): DataFrame =
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = ck.sparkSession.asInstanceOf[classic.SparkSession]
        // The frame was EAGERLY materialized, so the block manager knows
        // its true size — carry THAT (constant digits, and more truthful
        // than any estimate, so size-based planning like the peel loops'
        // fringe-set auto-broadcast keeps working), falling back to
        // defaultSizeInBytes for a block-less frame.
        val size = session.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => (i.memSize + i.diskSize).max(1L))
          .getOrElse(session.sessionState.conf.defaultSizeInBytes)
        classic.Dataset.ofRows(session,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(session,
            Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
              sizeInBytes = BigInt(size))),
            None))
      case _ => ck
    }
}
