package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <sfDir> <name>...
  * Runs each query twice (cold, warm) and prints seconds. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Sessions.build("graft-timeone")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[timeone] $name run$i $sec%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
