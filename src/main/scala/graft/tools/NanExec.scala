package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.SparkEntry
import graft.core.Sessions

/** Non-finite-float robustness sweep: every catalog query against
  * clones of the real testdata where ~15% of the cells in every
  * DOUBLE/FLOAT column are NaN or ±Infinity, and embedding arrays
  * additionally carry NaN / null ELEMENTS (NullExec's cell-level mask
  * cannot reach inside an array).
  *
  * Why this matters at 100 TB: non-finite floats are a routine
  * production state — an upstream 0/0 in a permissive engine, a failed
  * normalization, an overflowing feature cross, a corrupt parse — and
  * they concentrate in exactly the numeric columns analytics touch.
  * NaN breaks totals silently, which is bad; but under ANSI mode any
  * cast of a non-finite value to an integral type (manual histogram
  * bucketing, epoch arithmetic, sketch bin indexes) is a thrown
  * CAST_INVALID_INPUT/OVERFLOW — a pipeline-breaker, same class the
  * EdgeExec and NullExec sweeps hunt. Acceptable outcomes: NaN/Inf or
  * NULL statistics, rows ordered per Spark's NaN semantics.
  * Unacceptable: any exception.
  *
  * Deterministic mask (xxhash64 row fingerprint, salted per column;
  * element ordinal folded in for array elements) so reruns and fix
  * verification see identical corruption.
  *
  *   sbt "runMain graft.tools.NanExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, NAN_EXEC.json)
  */
object NanExec {
  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "NAN_EXEC.json"
    val spark = Sessions.build("graft-nanexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-nans").toString
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
          System.err.println(s"[nanexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"nonfinite-float-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[nanexec] ${results.size - failed}/${results.size} ok on non-finite-float tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** NaN/+Inf/-Inf into ~15% of scalar double/float cells; NaN and
    * null into ~10% of embedding-array elements. */
  def corrupt(df: DataFrame, salt: String): DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    val out = df.schema.fields.zipWithIndex.foldLeft(df.withColumn("__fp", fp)) {
      case (d, (f, i)) => f.dataType match {
        case DoubleType | FloatType =>
          val r = pmod(xxhash64(col("__fp"), lit(i)), lit(20))
          d.withColumn(f.name,
            when(r === 0, lit(Double.NaN).cast(f.dataType))
              .when(r === 1, lit(Double.PositiveInfinity).cast(f.dataType))
              .when(r === 2, lit(Double.NegativeInfinity).cast(f.dataType))
              .otherwise(col(f.name)))
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          val et = f.dataType.asInstanceOf[ArrayType].elementType
          d.withColumn(f.name, {
            val fpc = col("__fp")
            transform(col(f.name), (x, idx) => {
              val r = pmod(xxhash64(fpc, lit(i), idx), lit(20))
              when(r === 0, lit(Double.NaN).cast(et))
                .when(r === 1, lit(null).cast(et))
                .otherwise(x)
            })
          })
        case _ => d
      }
    }
    out.drop("__fp")
  }
}
