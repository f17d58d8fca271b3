package graft

import graft.core.Sessions

/** Bench main: runs every registered query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line the
  * driver parses into BENCH_r{N}.json.
  *
  * `count()` is the benched action: it executes the full plan
  * (shuffles, joins, window functions) without paying collect/IO cost
  * for wide results. Failures are reported as -1 for that query but
  * EXCLUDED from the headline total so one bad query can't corrupt
  * the metric.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-bench")
    // JVM/codegen warmup so the alphabetically-first query doesn't
    // absorb one-time JIT + classloading cost into its measurement
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
