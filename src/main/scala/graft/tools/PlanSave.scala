package graft.tools

import java.nio.file.{Files, Paths}
import graft.SparkEntry
import graft.core.Sessions

/** Writes `explain("formatted")` output per query to files — the
  * optimization-round evidence format (`plans/r16/<query>_before.txt`
  * / `_after.txt`). Run:
  *   sbt "runMain graft.tools.PlanSave <outDir> <suffix> <q1> <q2> ..."
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.1 — plan shapes are
  * statistics-dependent, so dump at the bench SF, not the smoke SF).
  */
object PlanSave {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("graft-plansave")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"), txt.getBytes("UTF-8"))
      println(s"[plansave] wrote $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
