package graft.plans

import org.apache.spark.sql.DataFrame

/**
 * Release contract for checkpoint-backed results — the missing half of
 * the iterative operators' storage discipline.
 *
 * Iterative operators ([[graft.operators.Graph]],
 * [[graft.operators.Dedup.connectedComponents]],
 * [[graft.operators.Centroids]], [[graft.operators.Attribution]]…)
 * return `localCheckpoint(eager = true)` frames: the checkpoint
 * truncates the iteration's lineage and lets the operator unpersist
 * its INTERNAL caches before returning, but the checkpoint's own
 * block-manager storage has CALLER-OWNED lifetime — it lives until
 * the JVM drops the frame. A session that runs many heavy iterative
 * queries back-to-back therefore accumulates dead result blocks, and
 * the block-manager pressure taxes later queries (measured at sf1:
 * pagerank_weighted 54.9 s → 198 s on its second warm repetition
 * before this contract existed — see BASELINE.md round 8).
 *
 * [[release]] frees those blocks explicitly. AFTER RELEASE THE FRAME
 * IS DEAD: a local checkpoint discards the lineage needed to
 * recompute it, so any further action on the frame (or anything
 * derived from it that was not itself materialized) throws. Call it
 * when — and only when — the result has been fully consumed (written,
 * collected, or folded into something materialized). Bench and
 * QueryTime release every query's result between timed runs for
 * exactly this reason.
 */
object Checkpoints {

  /** Unpersist every checkpoint-backed leaf (`LogicalRDD` sources
    * reachable from `df`'s analyzed plan). Returns the number of
    * storage handles released. No-op (0) for plans with no checkpoint
    * leaves — safe to call on any frame. Deliberately does NOT touch
    * `InMemoryRelation` (`.cache()`) leaves: a cached table is a
    * deliberate cross-query PIN (PipelineExecutor.materialize) with
    * its own unpersist path, and unlike a checkpoint it can recompute
    * if evicted — the leak this contract closes is specifically the
    * unrecomputable, caller-owned checkpoint block. */
  def release(df: DataFrame, blocking: Boolean = false): Int = {
    var n = 0
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking); n += 1
      case _ =>
    }
    n
  }
}
