package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Real block release for `localCheckpoint`ed frames.
  *
  * `Dataset.unpersist` routes through the CacheManager, which only
  * tracks frames registered via `Dataset.persist` — for a checkpointed
  * frame it is a silent NO-OP (probe-verified, r16: the pinned RDD id
  * survives `unpersist(blocking = true)` untouched). Every iterative
  * operator that "released" its previous round with `unpersist()` was
  * therefore retaining ALL rounds' blocks until session end. At bench
  * scale that is megabytes; at 100 TB the leaked frames are
  * corpus-sized edge lists (ConnectedComponents pins one per round for
  * ~O(log n) rounds) competing with the working set for
  * executor memory/disk.
  *
  * The pin lives on the RDD inside the checkpointed plan's `LogicalRDD`
  * root, so that is what must be unpersisted. ROOT-strict by design:
  * only a frame that IS a checkpoint (analyzed plan root = LogicalRDD)
  * releases anything — a derived frame silently no-ops rather than
  * walking the tree, because collecting LogicalRDDs from a derived
  * plan would release an upstream frame other consumers still need,
  * and a lazily-checkpointed consumer CANNOT recompute it (checkpoint
  * truncates lineage; the blocks are the only copy).
  *
  * Release ordering stays the caller's job: release a frame only after
  * every lazily-checkpointed consumer has materialized.
  */
object Checkpoints {

  /** Release `df`'s checkpoint blocks. No-op when `df` is not itself a
    * checkpoint root. Non-blocking: the removal completes asynchronously
    * while the next round's jobs run. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
