package graft.core

import org.apache.spark.sql.DataFrame

/** Shared resource-release idioms for tools and operators — each was
  * duplicated inline at least twice before landing here (review
  * finding r15), and each has a subtlety worth centralizing:
  *
  *  - localCheckpoint blocks are NOT CacheManager entries, so
  *    `Dataset.unpersist()` is a silent no-op on them; the blocks
  *    otherwise wait for the ContextCleaner's periodic GC (~30 min).
  *    Deterministic release goes through the plan's LogicalRDD leaf.
  *  - recursive temp-dir deletion must walk depth-first and tolerate
  *    paths that never got created (a tool that failed early).
  */
object Resources {

  /** Deterministically free a localCheckpoint'ed frame's storage
    * blocks (the Changelog r14 idiom): unpersist the RDD behind the
    * LogicalRDD the checkpoint rebased the plan onto. Acts ONLY when
    * that LogicalRDD is the analyzed plan's ROOT — i.e. `df` is the
    * checkpoint result itself, not something derived from one. A
    * leaf-search would also match RDD-backed leaves EMBEDDED in a
    * derived plan (a frame built over a cached RDD, or joining a
    * checkpointed input another consumer still uses) and silently
    * evict blocks that consumer depends on (review finding r15).
    * True no-op on frames that aren't checkpoint-rooted.
    * `blocking = true` is for measurement-hygiene callers (the
    * scaling/bench probes): an async release may not finish before
    * the next probe starts timing, re-leaking the pressure the free
    * exists to remove (ADVICE r15). Latency-sensitive streaming
    * callers (Changelog's per-batch roll) keep the async default. */
  private[graft] def freeCheckpoint(df: DataFrame,
                                    blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = blocking)
      case _ => ()
    }

  /** Depth-first recursive delete; absent paths are a no-op. */
  private[graft] def deleteRecursively(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
