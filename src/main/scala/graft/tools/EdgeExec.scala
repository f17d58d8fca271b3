package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Degenerate-input robustness sweep: every catalog query against
  * ZERO-ROW tables (same schemas as the real testdata, no rows).
  *
  * Why this matters at 100 TB: a filter that matches nothing, an empty
  * source partition, a date range with no events — every production
  * pipeline hits the empty-input case constantly, usually inside a
  * larger DAG where one operator's empty output feeds the next. A
  * query that NPEs or throws on empty input is a pipeline-breaker even
  * when its non-empty semantics are perfect. Acceptable outcomes on
  * empty input: an empty result, or scalar rows with NULL/NaN
  * statistics. Unacceptable: any thrown exception.
  *
  *   sbt "runMain graft.tools.EdgeExec [schemaSfDir] [outJson] [nRows]"
  *     (defaults /root/testdata/sf0.001, EDGE_EXEC.json, 0)
  *
  * nRows = 0 is the empty-input sweep; nRows = 1 is the single-row
  * sweep (every sample-variance /(n-1), every two-group statistic with
  * one group absent — the degenerate-denominator class ANSI turns from
  * NaN into a thrown DIVIDE_BY_ZERO). The clones are derived from the
  * REAL tables (limit n) so this can never drift from the testdata
  * contract.
  */
object EdgeExec {
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "EDGE_EXEC.json"
    val nRows = if (args.length > 2) args(2).toInt else 0
    val spark = Sessions.build("graft-edgeexec")
    graft.Bench.warmJvm(spark)

    val emptyDir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    tables.foreach { tbl =>
      spark.read.parquet(s"$schemaDir/$tbl.parquet").limit(nRows)
        .write.mode("overwrite").parquet(s"$emptyDir/$tbl.parquet")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val status =
        try {
          val df = fn(spark, emptyDir)
          df.write.format("noop").mode("overwrite").save()
          val n = df.count()
          s"ok:$n"
        } catch { case e: Throwable =>
          val m = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).replaceAll("\\s+", " ").take(160)
          System.err.println(s"[edgeexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"degenerate-input-robustness","n_rows":$nRows,"schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[edgeexec] ${results.size - failed}/${results.size} ok on ${nRows}-row tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
