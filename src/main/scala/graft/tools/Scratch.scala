package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.functions.TextOps

/** Ad-hoc perf experiments (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-scratch")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val df = graft.SparkEntry.queries(sys.env.getOrElse("SCRATCH_Q", "dd_minhash"))(spark, sfDir)
    // SCRATCH_RUN=1: execute THIS queryExecution (toRdd, not count —
    // count builds a new one) so AQE finalizes and stage reuse shows
    if (sys.env.contains("SCRATCH_RUN")) df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    // count signature evaluations: each Scan of documents = one pass
    println("[scratch] scans=" + "Scan parquet".r.findAllIn(plan).size +
      " exchanges=" + "Exchange".r.findAllIn(plan).size +
      " reused=" + "ReusedExchange".r.findAllIn(plan).size)
    println(plan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("Exchange") ||
      l.contains("Generate") || l.contains("Join") || l.contains("Project"))
      .map(_.take(140)).mkString("\n"))
  }
}
