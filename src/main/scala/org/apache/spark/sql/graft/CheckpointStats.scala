package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.{DataFrame, Row}

/** Honest statistics for checkpointed frames.
  *
  * `Dataset.localCheckpoint` wraps the materialized blocks in a
  * [[LogicalRDD]] that INHERITS the pre-checkpoint plan's statistics
  * (`LogicalRDD.fromDataset` passes `originStats`). For one-shot
  * checkpoints that is a feature; for ITERATIVE algorithms it is a time
  * bomb: Catalyst's size-only estimator multiplies child sizes through
  * joins, so a loop that self-joins its own checkpoint output and
  * re-checkpoints compounds the estimate exponentially — after k rounds
  * the `sizeInBytes` BigInt carries O(c^k) bits, and the optimizer's
  * stats walks (`InjectRuntimeFilter`, broadcast-threshold checks) grind
  * on multi-million-bit BigInteger multiplications. Measured on the
  * embedding-cluster closure at sf0.1: the bench query went from seconds
  * to >7 minutes of pure driver-side BigInt math once a second pointer
  * jump per round squared the per-round growth again.
  *
  * The fix is to rebuild the checkpointed leaf with statistics derived
  * from the REAL row count — which iterative callers usually know for
  * free (the closure's fixpoint witness is already an aggregate over the
  * frame). Pure metadata surgery: the materialized RDD is reused as-is,
  * no extra job, no recompute.
  */
object CheckpointStats {

  /** Rebuild an already-checkpointed `df` (its plan must be the
    * [[LogicalRDD]] leaf `localCheckpoint` produced) so the leaf reports
    * `rows * rowBytes` instead of the inherited estimate. Frames whose
    * plan is not a bare checkpoint leaf are returned unchanged.
    */
  def withRowCount(df: DataFrame, rows: Long, rowBytes: Long): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val stats = Statistics(
          sizeInBytes = BigInt(rows.max(1L)) * rowBytes.max(1L),
          rowCount = Some(BigInt(rows.max(0L))))
        val pinned = LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(
          ds.sparkSession, Some(stats), None)
        Dataset.ofRows(ds.sparkSession, pinned)
      case _ => df
    }
  }

  /** Free the persisted blocks behind a checkpointed frame NOW.
    *
    * `Dataset.unpersist` routes through the cache manager, which only
    * knows `InMemoryRelation` caches — on a `localCheckpoint` frame
    * (and doubly so on one re-wrapped by [[withRowCount]], whose plan
    * identity changed) it is a no-op, and the checkpoint RDD blocks
    * linger in executor storage until the ContextCleaner GCs the RDD.
    * Iterative algorithms that checkpoint per round (PageRank, the
    * closure) would accumulate one obsolete rank/edge snapshot per
    * iteration. This unpersists the underlying RDD directly; frames
    * whose plan is not a checkpoint leaf are left untouched.
    */
  def free(df: DataFrame): Unit =
    df.asInstanceOf[Dataset[Row]].queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
