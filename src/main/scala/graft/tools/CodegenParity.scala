package graft.tools

import graft.SparkEntry
import graft.core.Sessions
import org.apache.spark.sql.Row

/** Whole-catalog codegen-vs-interpreted differential gate.
  *
  * Round 9 ran this sweep OFF-GATE (a manual NO_CODEGEN verify against
  * the DuckDB oracle, BENCH_NOTES "Round-9 hardening"); VERDICT r9 #8
  * asked for it to become a committed, repeatable gate. This main is
  * that gate, made self-contained: every catalog query runs TWICE in
  * one session — once with the default codegen pipeline, once with
  * `spark.sql.codegen.factoryMode=NO_CODEGEN` + whole-stage codegen
  * off — and the two result sets are compared as sorted row multisets.
  *
  * Why this shape: every custom Catalyst expression in the repo ships
  * BOTH `doGenCode` and an interpreted `eval` (KernelParitySpec pins
  * them equal on fixtures). The risk KernelParitySpec cannot see is a
  * divergence that only appears in real query context (a kernel inside
  * a hash-agg partial, under AQE replanning, after a ReuseExchange).
  * Running the full catalog under both factory modes and demanding
  * identical rows closes exactly that hole, with no DuckDB dependency.
  *
  *   sbt "runMain graft.tools.CodegenParity [sfDir] [outJson]"
  *     (defaults /root/testdata/sf0.01, CODEGEN_PARITY.json)
  *
  * Exit code 1 on any mismatch or error, so this sits in the gate row
  * next to FullExec / check.py.
  */
object CodegenParity {
  /** Row -> canonical string. Row.toString is stable for identical
    * values (same double bits print identically; arrays/structs render
    * element-wise), so multiset equality of these strings is value
    * equality of the result sets. */
  def canon(rows: Array[Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  /** Run `body` with the interpreted expression pipeline (no codegen
    * fallback, no whole-stage codegen), restoring defaults after.
    * Public so CodegenParitySpec can prove the switch is LIVE (the
    * executed plan really loses its WholeStageCodegen spans). */
  def withMode[A](spark: org.apache.spark.sql.SparkSession,
                  mode: String, wholeStage: Boolean)(body: => A): A = {
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    try body
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  /** One query's parity status: "ok", "mismatch: ...", or "error: ...". */
  def compareOne(spark: org.apache.spark.sql.SparkSession,
                 sfDir: String, name: String,
                 fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): String =
    try {
      val gen = canon(fn(spark, sfDir).collect())
      val interp = withMode(spark, "NO_CODEGEN", wholeStage = false) {
        canon(fn(spark, sfDir).collect())
      }
      diff(gen, interp).fold("ok") { d =>
        System.err.println(s"[codegen-parity] $name MISMATCH: $d")
        s"mismatch: $d"
      }
    } catch { case e: Throwable =>
      val m = String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(200)
      System.err.println(s"[codegen-parity] $name FAILED: $m")
      s"error: $m"
    }

  /** None if equal; Some(first differing pair) otherwise. */
  def diff(gen: Seq[String], interp: Seq[String]): Option[String] =
    if (gen == interp) None
    else Some(gen.zipAll(interp, "<absent>", "<absent>")
      .find { case (a, b) => a != b }
      .map { case (a, b) => s"codegen=${a.take(120)} interpreted=${b.take(120)}" }
      .getOrElse(s"sizes ${gen.size} vs ${interp.size}"))

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outJson = if (args.length > 1) args(1) else "CODEGEN_PARITY.json"
    val spark = Sessions.build("graft-codegen-parity")
    graft.Bench.warmJvm(spark)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> compareOne(spark, sfDir, name, fn)
    }
    val failed = results.count(_._2 != "ok")
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"codegen-vs-interpreted-parity","sf_dir":"${esc(sfDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[codegen-parity] ${results.size - failed}/${results.size} parity ok at $sfDir -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
