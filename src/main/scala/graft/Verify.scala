package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import graft.core.Sessions

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: only dump these queries (fast iteration);
    // the driver always calls with exactly (sfDir, outDir) = full dump
    val only = args.drop(2).toSet
    val spark = Sessions.build("graft-verify")
    new java.io.File(outDir).mkdirs()
    // Failed queries get an explicit entry in _errors.json (not just a
    // stderr line): round 7 showed that silently-absent result dirs
    // read as "query deleted" rather than "query erroring", hiding a
    // 59-query regression from the artifact diff.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // rc stays 0 even with failures: the driver must still DuckDB-compare
    // the surviving dumps — a non-zero exit would zero the whole round.
    Files.writeString(Paths.get(s"$outDir/_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // provenance: which tree produced this dump (ADVICE r8 — artifacts
    // must carry their origin so stale evidence is self-identifying)
    Files.writeString(Paths.get(s"$outDir/_provenance.json"),
      s"""{${graft.core.Provenance.jsonFields},"sfDir":${q(sfDir)}}""")
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(",")}")
    spark.stop()
  }
}
