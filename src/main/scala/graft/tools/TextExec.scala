package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.SparkEntry
import graft.core.Sessions

/** Adversarial-text robustness sweep: every catalog query against
  * clones of the real testdata where ~25% of the cells in every
  * STRING column are replaced with hostile-but-valid-UTF-8 content —
  * empty strings, whitespace-only, emoji ZWJ sequences, CJK, RTL text
  * with bidi control characters, stacked combining marks, astral-plane
  * code points (surrogate pairs), control characters including NUL,
  * regex metacharacters, JSON/quote injection, and a ~100 KB document.
  *
  * Why this matters at 100 TB: a web-scale LLM training corpus IS this
  * data. Every one of these shapes appears millions of times in a real
  * crawl, and they concentrate in exactly the columns the text/dedup/
  * pipeline operators touch. The crash surface is real: under ANSI
  * mode `element_at`/array indexing on the empty token array of an
  * empty document throws, string-length arithmetic that goes negative
  * throws on the cast, and surrogate pairs break any operator that
  * treats chars as code points. Acceptable outcomes: empty token sets,
  * NULL scores, rows filtered away. Unacceptable: any exception.
  *
  * Deterministic mask (xxhash64 row fingerprint, salted per column) so
  * reruns and fix verification see identical corruption.
  *
  *   sbt "runMain graft.tools.TextExec [schemaSfDir] [outJson]"
  *     (defaults /root/testdata/sf0.001, TEXT_EXEC.json)
  */
object TextExec {
  def main(args: Array[String]): Unit = {
    val schemaDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outJson = if (args.length > 1) args(1) else "TEXT_EXEC.json"
    val spark = Sessions.build("graft-textexec")
    graft.Bench.warmJvm(spark)

    val dir = java.nio.file.Files.createTempDirectory("graft-texts").toString
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
          System.err.println(s"[textexec] $name FAILED: $m")
          s"error: $m"
        }
      name -> status
    }
    val failed = results.count(_._2.startsWith("error"))
    def esc(s: String) = SweepJson.esc(s)
    val entries = results
      .map { case (n, st) => s""""$n":"${esc(st)}"""" }.mkString("{", ",", "}")
    val json =
      s"""{"action":"adversarial-text-robustness","schema_dir":"${esc(schemaDir)}","n_queries":${results.size},"n_failed":$failed,"queries":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[textexec] ${results.size - failed}/${results.size} ok on adversarial-text tables -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** The hostile pool. Index 9 is the heavyweight (~100 KB, mixed
    * scripts so tokenizers/shinglers produce volume, repeated so
    * rolling hashes and n-gram windows slide through the whole range).
    * All entries are valid UTF-8 — parquet round-trips them exactly. */
  val pool: Seq[String] = Seq(
    "",
    " \t\n\r  ",
    "👩‍👩‍👧 🔥💯🚀 ™️",
    "这是测试文档漢字かなカナ한글테스트",
    "\u202e" + "مرحبا بالعالم שלום" + "\u202c",
    "é̂̃̄̅à̖̗o͜͡",
    "𝔘𝔫𝔦 𓀀𓀁 🂡",
    "a\u0000b\u0001c\u0007d\u001be\u007f",
    "((a|b)*+?[x-]{2,}\\Q\\E$^.\\d\\p{L}",
    ("词word🔥 \"k\": {<p>'&amp;</p>} " * 2000)
  )

  /** Replace ~25% of cells in every STRING column: r in [0,40) maps
    * 0..8 to pool(r), 9 to the heavyweight entry. */
  def corrupt(df: DataFrame, salt: String): DataFrame = {
    val fp = xxhash64(df.columns.map(col) :+ lit(salt): _*)
    val poolCol = array(pool.map(lit): _*)
    val out = df.schema.fields.zipWithIndex.foldLeft(df.withColumn("__fp", fp)) {
      case (d, (f, i)) => f.dataType match {
        case StringType =>
          val r = pmod(xxhash64(col("__fp"), lit(i)), lit(40))
          d.withColumn(f.name,
            when(r < 10, element_at(poolCol, (r + 1).cast("int")))
              .otherwise(col(f.name)))
        case _ => d
      }
    }
    out.drop("__fp")
  }
}
