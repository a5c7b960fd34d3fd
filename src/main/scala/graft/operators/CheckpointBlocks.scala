package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Eager release of a localCheckpoint'd frame's block store.
  *
  * `Dataset.localCheckpoint(eager = true)` persists the materialized
  * rows and truncates lineage to a [[LogicalRDD]] leaf; the blocks are
  * normally released by the ContextCleaner — but only after a GC
  * collects the RDD object AND the cleaner drains its weak-ref queue.
  * Iterative operators (CC label rounds, large-star rounds, BPE merge
  * rounds) create one checkpoint per round, so in a long session the
  * stale rounds' blocks pile up GC-timed, inflating the measured cost of
  * whatever runs next (round-7 q102: 14.8 s in-run vs 7.2 s isolated).
  * This drops a dead round's blocks the moment its successor is
  * materialized, keeping resident checkpoint storage at one round, not
  * O(rounds).
  *
  * The frame must never be used again after release: the lineage was
  * truncated at checkpoint time, so there is nothing to recompute from —
  * a later action fails with a missing-block error rather than silently
  * recomputing. Callers therefore only release frames they OWN (loop
  * temporaries), never returned results. */
private[graft] object CheckpointBlocks {
  def release(df: Dataset[_]): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
    case _ => () // not checkpoint-backed (e.g. the empty-input early path)
  }
}
