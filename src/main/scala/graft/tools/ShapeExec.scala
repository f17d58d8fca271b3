package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.SparkEntry
import graft.core.Sessions

/** Vector shape-drift robustness sweep: every catalog query against
  * clones of the real testdata where ~15% of embedding arrays have the
  * WRONG LENGTH — truncated to half, padded past the nominal
  * dimension, or empty.
  *
  * Why this matters at 100 TB: the embedding column of a production
  * corpus is written by many encoder versions over years — dimension
  * changes (v1 shipped 32-d, v2 shipped 64-d), truncated writes from
  * preempted jobs, and empty arrays from failed encodes all coexist in
  * the same column. Fixed-dimension code crashes in two ways under
  * ANSI mode: `element_at(v, i)` past the end THROWS
  * (INVALID_ARRAY_INDEX, not NULL), and index arithmetic derived from
  * `size(v)` drifts. Acceptable outcomes: partial-prefix scores (the
  * codegen kernels fold over min(|a|,|b|) by design), NULL statistics,
  * rows filtered. Unacceptable: any exception.
  *
  * Deterministic mask (xxhash64 row fingerprint, salted per column).
  *
  *   sbt "runMain graft.tools.ShapeExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, SHAPE_EXEC.json)
  */
object ShapeExec {
  /** Truncate / pad / empty ~15% of array cells (r in [0,20): 0 →
    * first half only, 1 → padded to 1.5× with a constant tail, 2 →
    * empty). Padding values are small exact constants so padded
    * vectors stay finite. */
  def corrupt(df: DataFrame, salt: String): DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    val out = df.schema.fields.zipWithIndex.foldLeft(df.withColumn("__fp", fp)) {
      case (d, (f, i)) => f.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          val et = f.dataType.asInstanceOf[ArrayType].elementType
          val r = pmod(xxhash64(col("__fp"), lit(i)), lit(20))
          val half = (size(col(f.name)) / 2).cast("int")
          val pad = transform(sequence(lit(1), half),
            x => (x.cast("double") / 100.0).cast(et))
          d.withColumn(f.name,
            when(r === 0, slice(col(f.name), lit(1), half))
              .when(r === 1, concat(col(f.name), pad))
              .when(r === 2, array().cast(f.dataType))
              .otherwise(col(f.name)))
        case _ => d
      }
    }
    out.drop("__fp")
  }

  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "SHAPE_EXEC.json"
    val spark = Sessions.build("graft-shapeexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-shape").toString
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
          System.err.println(s"[shapeexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"vector-shape-drift-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[shapeexec] ${results.size - failed}/${results.size} ok on shape-drift tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
