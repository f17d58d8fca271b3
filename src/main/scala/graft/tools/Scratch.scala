package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.functions.TextOps

/** Ad-hoc perf experiments (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("graft-scratch")
    spark.range(1000000).selectExpr("sum(id)").collect()
    if (sys.env.get("SCRATCH_Q").contains("_jacprof")) {
      // stage-by-stage cost of the jaccard pair pipeline at sfDir
      import org.apache.spark.sql.expressions.Window
      def time(tag: String)(f: => Long): Unit = {
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = f
          println(f"[jacprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      }
      val docs = Tables.load(spark, sfDir, "documents")
      val sh = docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .withColumn("hs", array_distinct(
          graft.functions.VectorFunctions.shingleHashes(col("tk"), 3)))
        .filter(col("hs").isNotNull)
        .select(col("doc_id"), size(col("hs")).as("n"),
          explode(col("hs")).as("sh"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
        .filter(col("df") <= 1000)
      time("a_shingles")(sh.count())
      val joined = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      time("b_selfjoin")(joined.count())
      val grouped = joined
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
      time("c_groupby")(grouped.count())
      // variant: df via groupBy + shuffle-hash join instead of window
      val base = docs
        .withColumn("tk", TextOps.tokens(col("text")))
        .withColumn("hs", array_distinct(
          graft.functions.VectorFunctions.shingleHashes(col("tk"), 3)))
        .filter(col("hs").isNotNull)
        .select(col("doc_id"), size(col("hs")).as("n"),
          explode(col("hs")).as("sh"))
      val dfc = base.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000)
      val sh2 = base.join(dfc, "sh")
      time("d_groupby_df")(sh2.count())
      val g2 = sh2.as("a").join(sh2.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.n").as("na"), col("b.n").as("nb"))
        .agg(count(lit(1)).as("inter"))
      time("e_full_variant")(g2.count())
      spark.stop(); return
    }
    val df = graft.SparkEntry.queries(sys.env.getOrElse("SCRATCH_Q", "dd_minhash"))(spark, sfDir)
    // SCRATCH_RUN=1: execute THIS queryExecution (toRdd, not count —
    // count builds a new one) so AQE finalizes and stage reuse shows
    if (sys.env.contains("SCRATCH_RUN")) df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    // count signature evaluations: each Scan of documents = one pass
    println("[scratch] scans=" + "Scan parquet".r.findAllIn(plan).size +
      " exchanges=" + "Exchange".r.findAllIn(plan).size +
      " reused=" + "ReusedExchange".r.findAllIn(plan).size)
    println(plan.linesIterator.filter(l =>
      l.contains("Scan parquet") || l.contains("Exchange") ||
      l.contains("Generate") || l.contains("Join") || l.contains("Project"))
      .map(_.take(140)).mkString("\n"))
  }
}
