package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative fixpoints (pagerank, label
  * propagation, k-core, HyperBall, BPE): every `every`-th generation of
  * the loop state is CHECKPOINTED — its physical result becomes the new
  * plan root — so the analyzed plan stays bounded no matter how many
  * rounds run. Per-round `persist` alone caches execution but the
  * logical plan still deepens by one join+agg per round; past a few
  * dozen rounds analysis/optimization time (and for self-joining loops,
  * plan SIZE) dominates.
  *
  * `every = 0` disables truncation entirely — the default for the
  * shallow fixed-iteration configurations the gate queries run, whose
  * 2-3-round plans do not need it and should not pay the materialization.
  *
  * Checkpoint flavor follows [[graft.ops.Dedup.connectedComponents]]'s
  * contract: if the session has a RELIABLE checkpoint directory
  * configured (`SparkContext.setCheckpointDir` — the cluster deployment
  * mode, survives executor loss), rounds use `checkpoint(eager = true)`
  * and old round files are reclaimed by
  * `spark.cleaner.referenceTracking.cleanCheckpoints` or by deleting the
  * UUID subdir after the result is consumed; otherwise
  * `localCheckpoint(eager = true)` (executor-block storage — fine
  * single-node, lost on executor churn). The superseded local checkpoint
  * is freed as soon as its successor is materialized, so at most two
  * generations of blocks are ever held. Freeing goes through the
  * checkpointed plan's underlying RDD: `Dataset.unpersist` is a
  * CacheManager call, and a localCheckpoint-backed Dataset was never
  * registered there (localCheckpoint persists the internal RDD
  * directly), so the Dataset-level call alone would leave the
  * MEMORY_AND_DISK blocks to the ContextCleaner's GC-driven reclaim.
  *
  * `eagerFree = false` DISABLES that eager reclaim: superseded
  * generations keep their blocks until the ContextCleaner garbage-
  * collects the RDDs. This is REQUIRED for loops that capture per-round
  * DERIVED frames consumed after the loop (the HyperBall per-radius
  * estimate tables): a checkpointed generation's lineage is truncated,
  * so freeing its blocks while a later lazy plan still references them
  * is an unrecoverable use-after-free
  * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), not a recompute. Last-state-only
  * loops (pagerank, LPA, k-core, CC, BPE) keep the default eager free.
  */
final class Truncator(every: Int, eagerFree: Boolean = true) {
  require(every >= 0, s"checkpointEvery must be >= 0 (0 = off), got $every")

  private var round = 0
  private var prev: Option[DataFrame] = None

  /** Pass the new generation of loop state through: on truncation rounds
    * returns the checkpointed (lineage-free) frame; otherwise
    * `orElse(df)` — the hook for loops that persist their non-truncated
    * generations (pass `Caches.persist`). Must be called exactly once
    * per round so the counter tracks the loop.
    */
  def apply(df: DataFrame,
      orElse: DataFrame => DataFrame = identity): DataFrame = {
    round += 1
    if (every > 0 && round % every == 0) {
      val reliable =
        df.sparkSession.sparkContext.getCheckpointDir.isDefined
      // eager in both flavors: the state must materialize BEFORE the
      // superseded generation's blocks are dropped
      val cp =
        if (reliable) df.checkpoint(eager = true)
        else df.localCheckpoint(eager = true)
      if (eagerFree) prev.foreach(free)
      prev = Some(cp)
      cp
    } else orElse(df)
  }

  /** Drop a superseded checkpoint generation's storage NOW. The plan of a
    * checkpointed Dataset is a single `LogicalRDD` leaf over the
    * checkpointed RDD; for a localCheckpoint that RDD holds the persisted
    * blocks, so `rdd.unpersist` is the call that actually releases them
    * (reliable checkpoints keep files, reclaimed by
    * `spark.cleaner.referenceTracking.cleanCheckpoints`). The
    * Dataset-level unpersist stays as a belt-and-braces CacheManager
    * sweep for loops that also `persist` their generations.
    */
  private def free(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
