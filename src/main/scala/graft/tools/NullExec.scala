package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.core.Sessions

/** Null-injection robustness sweep: every catalog query against clones
  * of the real testdata where ~20% of the cells in EVERY column —
  * keys, timestamps, text, embeddings included — are replaced by NULL.
  *
  * Why this matters at 100 TB: web-scale ingested data is full of
  * nulls (absent fields, failed extractions, schema drift), and at a
  * hundred terabytes every column WILL contain them. SQL semantics
  * handle nulls by construction (aggregates skip them, equi-joins
  * never match them, comparisons yield NULL) — but typed Dataset
  * pipelines (primitive-field Encoders NPE on null), custom kernels,
  * and string/array lambdas do not unless written for it. A query that
  * throws on a null cell is a pipeline-breaker exactly like the /0
  * class EdgeExec hunts. Acceptable outcomes: null rows dropped per
  * SQL semantics, or NULL statistics. Unacceptable: any exception.
  *
  * Injection is deterministic (xxhash64 of the full original row,
  * salted per column ordinal) so reruns and fix verification see the
  * exact same null mask; the clones derive from the REAL tables so the
  * sweep can never drift from the testdata contract.
  *
  *   sbt "runMain graft.tools.NullExec [schemaSfDir] [outJson] [denom]"
  *     (defaults /root/testdata/sf0.001, NULL_EXEC.json, 5 = 20% nulls)
  */
object NullExec {
  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "NULL_EXEC.json"
    val denom = if (args.length > 2) args(2).toInt else 5
    val spark = Sessions.build("graft-nullexec")
    graft.Bench.warmJvm(spark)

    val nullDir = java.nio.file.Files.createTempDirectory("graft-nulls").toString
    EdgeExec.tables.foreach { tbl =>
      corrupt(spark.read.parquet(s"$schemaDir/$tbl.parquet"), tbl, denom)
        .write.mode("overwrite").parquet(s"$nullDir/$tbl.parquet")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val status =
        try {
          val df = fn(spark, nullDir)
          df.write.format("noop").mode("overwrite").save()
          val n = df.count()
          s"ok:$n"
        } catch { case e: Throwable =>
          val m = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).replaceAll("\\s+", " ").take(160)
          System.err.println(s"[nullexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"null-injection-robustness","null_denom":$denom,"schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[nullexec] ${results.size - failed}/${results.size} ok on 1-in-$denom-null tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** NULL into 1-in-`denom` cells of EVERY column (deterministic
    * xxhash64 row-fingerprint mask, salted per column ordinal).
    * Shared with ComboExec, which stacks this on top of the other
    * corruption axes. */
  def corrupt(df: org.apache.spark.sql.DataFrame, salt: String, denom: Int): org.apache.spark.sql.DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    df.columns.zipWithIndex.foldLeft(df.withColumn("__fp", fp)) {
      case (d, (c, i)) =>
        d.withColumn(c,
          when(pmod(xxhash64(col("__fp"), lit(i)), lit(denom)) === 0,
            lit(null).cast(d.schema(c).dataType)).otherwise(col(c)))
    }.drop("__fp")
  }
}
