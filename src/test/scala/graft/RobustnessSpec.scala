package graft

import org.apache.spark.sql.functions._

/** Regression pins for the round-10 degenerate-input fixes (the
  * in-test twin of the EdgeExec artifact sweeps): every query that
  * ever crashed on a degenerate input runs here against exactly that
  * input and must complete. Degenerate inputs are NOT errors for an
  * analytics engine — a filter that matches nothing, a single row, a
  * constant series, an all-duplicates corpus, a zero embedding from a
  * failed encoder are all REAL production states, and under Spark 4's
  * ANSI mode every unguarded /0 (doubles included) is a thrown
  * SparkArithmeticException, not a NaN.
  */
class RobustnessSpec extends SparkSpec {

  private lazy val schemaDir = TestSpark.sf0001

  /** Write limit(n) clones of every table; mutate selected tables. */
  private def cloneDir(n: Int,
                       mutate: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] = Map.empty): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-rob$n").toString
    graft.tools.EdgeExec.tables.foreach { tbl =>
      val base = spark.read.parquet(s"$schemaDir/$tbl.parquet").limit(n)
      mutate.getOrElse(tbl, identity[org.apache.spark.sql.DataFrame] _)(base)
        .write.mode("overwrite").parquet(s"$dir/$tbl.parquet")
    }
    dir
  }

  private def mustRun(dir: String, names: Seq[String]): Unit = {
    val bad = names.flatMap { n =>
      try { SparkEntry.queries(n)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(n -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    assert(bad.isEmpty, s"degenerate-input crashes: $bad")
  }

  test("empty tables: the formerly-crashing queries complete") {
    mustRun(cloneDir(0), Seq("graph_reciprocity", "tw_motif"))
  }

  test("single-row tables: the degenerate-denominator class completes") {
    mustRun(cloneDir(1), Seq("agg_anova", "agg_bootstrap", "agg_moments",
      "agg_power", "emb_ch_index", "emb_pca", "emb_pca_scores",
      "emb_purity", "pipe_unimax", "text_jsd"))
  }

  test("two/five-row tables: the constant-series Pearson class completes") {
    mustRun(cloneDir(2), Seq("agg_cuped", "graph_assortativity",
      "text_mannwhitney", "tw_tsim"))
    mustRun(cloneDir(5), Seq("agg_cuped", "tw_acf"))
  }

  test("all-duplicates corpus: tf-idf cosine dedup completes (idf=0 everywhere)") {
    val dir = cloneDir(20, Map("documents" -> ((df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("text", lit("the same exact document body every single time")))))
    mustRun(dir, Seq("dd_tfidf_cos", "dd_jaccard", "dd_exact", "dd_minhash"))
  }

  test("zero-norm embedding (failed encoder): cosine queries complete") {
    val dir = cloneDir(20, Map("embeddings" -> ((df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("embedding",
        when(col("vec_id") === 1,
          transform(col("embedding"), _ => lit(0.0f)))
          .otherwise(col("embedding"))))))
    mustRun(dir, Seq("emb_knn", "emb_neardup", "emb_semdedup", "emb_kcenter"))
  }
}
