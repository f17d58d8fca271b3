package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
import graft.SparkEntry
import graft.core.Sessions

/** Extreme-numerics robustness sweep: every catalog query against
  * clones of the real testdata where ~10% of the cells in every
  * integral column are sentinel/boundary values (Long.MaxValue,
  * Long.MinValue, -1, 0; Int boundaries for INT columns) and ~10% of
  * timestamp cells are calendar extremes (year 9999, year 0001, the
  * last pre-epoch second, a far-past date).
  *
  * Why this matters at 100 TB: sentinel pollution is a routine
  * production state — -1/0/MAX_VALUE used as "unknown" markers by
  * upstream producers, epoch-zero and year-9999 placeholder dates,
  * overflow garbage from a buggy ETL stage. Under ANSI mode the crash
  * surface is arithmetic: any add/subtract/multiply on a MaxValue key, any
  * .cast("int") of a derived value that a boundary input pushes past
  * 2^31, any date arithmetic that materializes a range proportional
  * to (max - min) — a single year-9999 row turns a gap-fill grid into
  * millions of rows. Acceptable outcomes: weird group keys, empty
  * joins, NULL-guarded statistics. Unacceptable: exceptions or
  * input-proportional blowups driven by one bad row.
  *
  * Deterministic mask (xxhash64 row fingerprint, salted per column).
  *
  *   sbt "runMain graft.tools.NumExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, NUM_EXEC.json)
  */
object NumExec {
  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "NUM_EXEC.json"
    val spark = Sessions.build("graft-numexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-nums").toString
    EdgeExec.tables.foreach { tbl =>
      corrupt(spark.read.parquet(s"$schemaDir/$tbl.parquet"), tbl)
        .write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
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
          System.err.println(s"[numexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"extreme-numerics-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[numexec] ${results.size - failed}/${results.size} ok on extreme-numerics tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** Boundary sentinels into ~10% of integral cells (r in [0,40) maps
    * 0..3 to the four sentinels) and ~10% of timestamp cells to
    * calendar extremes. */
  def corrupt(df: DataFrame, salt: String): DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    val out = df.schema.fields.zipWithIndex.foldLeft(df.withColumn("__fp", fp)) {
      case (d, (f, i)) =>
        val r = pmod(xxhash64(col("__fp"), lit(i)), lit(40))
        f.dataType match {
          case LongType =>
            d.withColumn(f.name,
              when(r === 0, lit(Long.MaxValue))
                .when(r === 1, lit(Long.MinValue))
                .when(r === 2, lit(-1L))
                .when(r === 3, lit(0L))
                .otherwise(col(f.name)))
          case IntegerType =>
            d.withColumn(f.name,
              when(r === 0, lit(Int.MaxValue))
                .when(r === 1, lit(Int.MinValue))
                .when(r === 2, lit(-1))
                .when(r === 3, lit(0))
                .otherwise(col(f.name)))
          case TimestampType =>
            d.withColumn(f.name,
              when(r === 0, to_timestamp(lit("9999-12-31 23:59:59")))
                .when(r === 1, to_timestamp(lit("0001-01-01 00:00:00")))
                .when(r === 2, to_timestamp(lit("1969-12-31 23:59:59")))
                .when(r === 3, to_timestamp(lit("1677-09-22 00:00:00")))
                .otherwise(col(f.name)))
          case _ => d
        }
    }
    out.drop("__fp")
  }
}
