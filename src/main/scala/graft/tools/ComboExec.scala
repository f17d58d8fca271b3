package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Combined-corruption robustness sweep: every catalog query against
  * clones of the real testdata where ALL four single-axis corruptions
  * are stacked in the same tables — integral/timestamp boundary
  * sentinels (NumExec), NaN/±Inf floats and poisoned array elements
  * (NanExec), hostile UTF-8 strings (TextExec), and finally a 10%
  * all-column NULL mask (NullExec) layered on top.
  *
  * Why this matters at 100 TB: each single-axis sweep corrupts one
  * dimension while every other column stays clean, so a guard that
  * happens to rely on a *different* column being well-formed (a null
  * check that reads a neighbouring timestamp, a tokenizer that assumes
  * the doc length column matches the text) still passes. Real crawl
  * data corrupts several axes in the same ROW — a null key next to a
  * NaN score next to a bidi-bombed title is one ordinary record. The
  * stacked sweep is the crash-only composition test for that state.
  * Acceptable outcomes: rows dropped, NULL statistics, empty results.
  * Unacceptable: any exception.
  *
  * Corruption order is sentinels → floats → text → nulls: the NULL
  * mask goes LAST so every axis can also appear under a null neighbour
  * (the fingerprints re-derive from the already-corrupted rows, which
  * keeps the mask deterministic end-to-end).
  *
  *   sbt "runMain graft.tools.ComboExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, COMBO_EXEC.json)
  */
object ComboExec {
  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "COMBO_EXEC.json"
    val spark = Sessions.build("graft-comboexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-combo").toString
    EdgeExec.tables.foreach { tbl =>
      val base = spark.read.parquet(s"$schemaDir/$tbl.parquet")
      val stacked = NullExec.corrupt(
        TextExec.corrupt(
          NanExec.corrupt(
            NumExec.corrupt(base, s"$tbl#num"), s"$tbl#nan"), s"$tbl#text"),
        s"$tbl#null", 10)
      stacked.write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val status =
        try {
          val df = fn(spark, dir)
          df.write.format("noop").mode("overwrite").save()
          s"ok:${df.count()}"
        } catch { case e: Throwable =>
          val m = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).replaceAll("\\s+", " ").take(160)
          System.err.println(s"[comboexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"combined-corruption-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[comboexec] ${results.size - failed}/${results.size} ok on combined-corruption tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
