package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import graft.SparkEntry
import graft.core.Sessions

/** Huge-value / deep-nesting robustness sweep: every catalog query
  * against clones of the real testdata where ~3% of rows carry
  * pathologically LARGE values —
  *
  *   - `embeddings.embedding` padded to 4096 dims (64× nominal): the
  *     mixed-encoder corpus where one writer shipped a big model;
  *   - `documents.text` inflated to ~500 KB (→ ~100k whitespace
  *     tokens): the un-split book / minified-JS blob every crawl
  *     contains — stresses tokenize/shingle/winnow kernels that
  *     allocate per element, and (via the mm_* payload synthesis)
  *     half-megabyte binary payloads through the decode path;
  *   - `events.props` replaced by an 800-deep nested JSON object: the
  *     adversarial metadata blob — stresses get_json_object /
  *     from_json recursion;
  *   - `part.p_name` inflated to ~50 KB: the huge-array path for the
  *     fn_nested/fn_string split() batteries.
  *
  * Why this matters at 100 TB: per-ELEMENT work bounded per row at
  * nominal sizes (a 64-float fold, a shingle window) silently becomes
  * per-row megabyte allocation when the corpus holds pathological
  * rows, and ANSI mode turns out-of-range index arithmetic derived
  * from sizes into thrown errors instead of NULLs. Acceptable
  * outcomes: big rows score/filter/dedup like any other row, deep
  * JSON reads as NULL fields. Unacceptable: exceptions (including
  * JVM OOM from a single row) — the crash-only criterion of the
  * other sweeps.
  *
  * Deterministic mask (xxhash64 row fingerprint, salted per column).
  *
  *   sbt "runMain graft.tools.HugeExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, HUGE_EXEC.json)
  */
object HugeExec {
  private val HugeDim = 4096        // padded embedding dimension
  private val HugeTextChars = 500000 // ~100k whitespace tokens
  private val HugeNameChars = 50000
  private val JsonDepth = 800        // under Jackson's 1000 nesting cap

  /** Inflate ~1/32 of rows per targeted column. Pad values are small
    * exact constants (float-exact, shingle-able words) so huge rows
    * are big but never NaN/Inf — magnitude is the axis under test,
    * the NaN/text sweeps own value pathology. */
  def corrupt(df: DataFrame, salt: String): DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    val out = df.schema.fields.foldLeft(df.withColumn("__fp", fp)) {
      case (d, f) =>
        val r = pmod(xxhash64(col("__fp"), lit(f.name)), lit(32))
        f.dataType match {
          case ArrayType(FloatType, _) =>
            // pad to HugeDim with a deterministic small tail. The
            // already-wide guard matters: sequence(1, 0) DESCENDS to
            // [1, 0] (Spark defaults step to -1 when start > stop), so
            // an input at >= HugeDim dims would silently gain 2 pad
            // elements without it (ADVICE r12; latent at nominal 64).
            val pad = transform(
              sequence(lit(1), lit(HugeDim) - size(col(f.name))),
              x => (pmod(x, lit(7)).cast("double") / 100.0).cast("float"))
            d.withColumn(f.name,
              when(r === 0 && size(col(f.name)) < HugeDim,
                concat(col(f.name), pad)).otherwise(col(f.name)))
          case StringType if f.name == "text" || f.name == "p_name" =>
            val target = if (f.name == "text") HugeTextChars else HugeNameChars
            // repeat the row's own text (+ a space so tokens split)
            // until it crosses the target length
            val n = (lit(target) / (length(col(f.name)) + 1)).cast("int") + 1
            d.withColumn(f.name,
              when(r === 0, repeat(concat(col(f.name), lit(" ")), n))
                .otherwise(col(f.name)))
          case StringType if f.name == "props" =>
            val deep = concat(
              repeat(lit("{\"d\":"), JsonDepth), lit("1"),
              repeat(lit("}"), JsonDepth))
            d.withColumn(f.name,
              when(r === 0, deep).otherwise(col(f.name)))
          case _ => d
        }
    }
    out.drop("__fp")
  }

  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "HUGE_EXEC.json"
    val spark = Sessions.build("graft-hugeexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-huge").toString
    EdgeExec.tables.foreach { tbl =>
      corrupt(spark.read.parquet(s"$schemaDir/$tbl.parquet"), tbl)
        .write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val status =
        try {
          val df = fn(spark, dir)
          df.write.format("noop").mode("overwrite").save()
          val n = df.count()
          val sec = (System.nanoTime() - t0) / 1e9
          s"ok:$n:${graft.Bench.fmt3(sec)}s"
        } catch { case e: Throwable =>
          val m = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage)).replaceAll("\\s+", " ").take(160)
          System.err.println(s"[hugeexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"huge-value-deep-nesting-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[hugeexec] ${results.size - failed}/${results.size} ok on huge-value tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
