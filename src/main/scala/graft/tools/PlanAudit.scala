package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Whole-catalog physical-plan audit: flags the patterns that do not
  * survive a 100× scale-up, across EVERY registered query (PlanSpec
  * freezes the headline invariants; this sweeps the long tail).
  *
  *   CARTESIAN   CartesianProduct join
  *   BNLJ        BroadcastNestedLoopJoin (fine only when one side is
  *               a deliberate broadcast probe table, e.g. brute KNN)
  *   GLOBALWIN   a window function over a single unpartitioned
  *               partition (fine only on post-aggregate row counts)
  *   NOPUSH      a parquet scan with filters but no PushedFilters
  *
  * Run: sbt "runMain graft.tools.PlanAudit" — prints one line per
  * flagged query; exits 0 always (informational; PlanSpec is the gate).
  */
object PlanAudit {
  /** Queries where BNLJ is the DESIGN: one side is a deliberately
    * broadcast probe/constant table (query vectors, centroids, PQ LUT,
    * 1-row corpus totals, crossWithTiny) — the corpus side still
    * streams partition-parallel, so these scale. Anything else
    * acquiring a BNLJ is a regression. */
  private val expectedBnlj = Set(
    "emb_knn", "emb_ivf_assign", "emb_ivf_knn", "emb_kmeans", "emb_pq",
    "emb_semdedup", "join_cross", "text_lm_nll", "text_tfidf")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-planaudit")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val flags = Seq(
          "CARTESIAN" -> p.contains("CartesianProduct"),
          "BNLJ" -> (p.contains("BroadcastNestedLoopJoin") &&
            !expectedBnlj.contains(name)),
          "GLOBALWIN" -> p.linesIterator.exists(l =>
            l.contains("Window") && l.contains("partitionBy=[]")),
          "NOPUSH" -> (p.contains("PushedFilters: []") &&
            p.contains("DataFilters: [") && !p.contains("DataFilters: []"))
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) { flagged += 1; println(s"[audit] $name: ${flags.mkString(",")}") }
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage}")
      }
    }
    println(s"[audit] done: $flagged/${SparkEntry.queries.size} flagged")
    spark.stop()
  }
}
