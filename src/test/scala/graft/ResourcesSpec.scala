package graft

import org.apache.spark.sql.functions._
import graft.core.Resources

/** core.Resources.freeCheckpoint — the deterministic release for
  * localCheckpoint blocks (which live outside the CacheManager, so
  * Dataset.unpersist is a silent no-op on them). The r15 review
  * contract: it acts ONLY on checkpoint-ROOTED frames. A leaf-search
  * would also match RDD-backed leaves embedded in derived plans and
  * evict blocks a concurrent consumer still depends on.
  */
class ResourcesSpec extends SparkSpec {

  test("freeCheckpoint releases a checkpoint-rooted frame's blocks") {
    val s = spark
    import s.implicits._
    val before = s.sparkContext.getPersistentRDDs.keySet
    val ckpt = Seq((1L, "a"), (2L, "b")).toDF("k", "v").localCheckpoint()
    val added = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint registered no persistent RDD")
    Resources.freeCheckpoint(ckpt)
    val remaining = s.sparkContext.getPersistentRDDs.keySet & added
    assert(remaining.isEmpty,
      s"checkpoint blocks $remaining survived freeCheckpoint")
  }

  test("freeCheckpoint is a no-op on DERIVED frames over a live checkpoint") {
    val s = spark
    import s.implicits._
    // track ONLY the ids this checkpoint registers: in the shared
    // full-suite session other suites' persistent RDDs come and go,
    // so whole-keyset comparisons are not stable
    val pre = s.sparkContext.getPersistentRDDs.keySet
    val ckpt = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .localCheckpoint()
    val added = s.sparkContext.getPersistentRDDs.keySet -- pre
    assert(added.nonEmpty, "localCheckpoint registered no persistent RDD")
    // a derived plan (Project/Filter over the LogicalRDD leaf) models
    // "a frame built over a checkpointed input another consumer still
    // uses" — releasing through it would evict that consumer's blocks
    val derived = ckpt.filter(col("k") > 1).select(col("v"))
    Resources.freeCheckpoint(derived)
    assert((s.sparkContext.getPersistentRDDs.keySet & added) == added,
      "freeCheckpoint evicted blocks through a derived (non-root) plan")
    // the checkpoint is still usable by its other consumer...
    assert(ckpt.count() == 3)
    // ...and releasing through the ROOT still works afterwards
    Resources.freeCheckpoint(ckpt)
    assert((s.sparkContext.getPersistentRDDs.keySet & added).isEmpty,
      "root release failed after the derived-frame no-op")
  }
}
