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
    if (sys.env.get("SCRATCH_Q").contains("_tfidfprof")) {
      import graft.core.Exact
      import graft.functions.VectorFunctions
      def time(tag: String)(f: => Long): Unit =
        (1 to 2).foreach { i =>
          val t0 = System.nanoTime()
          val n = f
          println(f"[tfidfprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      val docs = Tables.load(spark, sfDir, "documents")
      time("a_tokenize_scan")(
        docs.withColumn("tk", TextOps.tokens(col("text")))
          .select(sum(size(col("tk")))).count())
      time("z_current")(
        graft.SparkEntry.queries("dd_tfidf_cos")(spark, sfDir).count())
      // variant: tokenize ONCE into a checkpointed base; postings,
      // doc count, and the shingle candidate branch all derive from it
      def variant(): Long = {
        val base = docs.withColumn("tk", TextOps.tokens(col("text")))
          .filter(size(col("tk")) > 0)
          .select(col("doc_id"), col("tk"))
          .localCheckpoint()
        val post = base.select(col("doc_id"), explode(col("tk")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfr = post.groupBy("w").agg(count(lit(1)).as("df"))
        val nd = base.agg(count(lit(1)).as("nd"))
        val wp = post.join(broadcast(dfr), "w").crossJoin(broadcast(nd))
          .select(col("doc_id"), col("w"),
            Exact.q6(col("tf").cast("double") *
              log(col("nd").cast("double") / col("df").cast("double"))).as("w8"))
          .localCheckpoint()
        val nrm = wp.groupBy("doc_id")
          .agg(sqrt(Exact.fsum(col("w8") * col("w8"))).as("nrm"))
        val sh = graft.operators.ShingleDf.capRare(base
          .withColumn("hs",
            array_distinct(VectorFunctions.shingleHashes(col("tk"), 3)))
          .filter(col("hs").isNotNull)
          .select(col("doc_id"), explode(col("hs")).as("sh")), "sh", 1000)
        val cand = sh.as("a").join(sh.as("b").hint("shuffle_hash"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct()
        val dv = wp.groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("w"), col("w8"))))
            .as("terms"))
        val dots = cand
          .join(dv.select(col("doc_id").as("da"), col("terms").as("ta")), Seq("da"))
          .join(dv.select(col("doc_id").as("db"), col("terms").as("tb")), Seq("db"))
          .select(col("da"), col("db"),
            VectorFunctions.sparseDot(col("ta"), col("tb")).as("dot"))
        dots
          .join(nrm.select(col("doc_id").as("da"), col("nrm").as("na")), Seq("da"))
          .join(nrm.select(col("doc_id").as("db"), col("nrm").as("nb")), Seq("db"))
          .select(col("da"), col("db"),
            (col("dot") / nullif(col("na") * col("nb"), lit(0.0))).as("cos"))
          .orderBy(col("cos").desc, col("da"), col("db")).limit(50)
          .count()
      }
      time("y_tokenize_once")(variant())
      spark.stop(); return
    }
    if (sys.env.get("SCRATCH_Q").contains("_ccnetprof")) {
      def time(tag: String)(f: => Long): Unit =
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = f
          println(f"[ccnetprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      time("z_current")(
        graft.SparkEntry.queries("pipe_ccnet")(spark, sfDir).count())
      def variant(): Long = {
        val stopwords = graft.queries.TextQueries.stopwords
        val docs = Tables.load(spark, sfDir, "documents")
          .withColumn("tk", TextOps.tokens(col("text")))
          .filter(size(col("tk")) > 0)
          .select(col("doc_id"), col("tk"),
            size(col("tk")).cast("long").as("ntok"),
            when(size(filter(col("tk"), t => t.isInCollection(stopwords))) > 0,
              "en").otherwise("unk").as("lang_guess"))
          .localCheckpoint()
        val ch = docs.select(col("doc_id"),
          explode(transform(
            sequence(lit(0), ceil(size(col("tk")).cast("double") / 8.0)
              .cast("int") - 1),
            i => TextOps.hash32(array_join(
              slice(col("tk"), i * 8 + 1, lit(8)), " ")))).as("h"))
        val kept = ch.groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
        val gated = docs.join(kept.hint("shuffle_hash"), Seq("doc_id"), "left")
          .filter(coalesce(col("n_kept"), lit(0L)) * 2 >=
            ceil(col("ntok").cast("double") / 8.0).cast("long"))
          .select(col("doc_id"), col("tk"), col("ntok"), col("lang_guess"))
        val tf = gated.select(col("doc_id"), col("lang_guess"), col("ntok"),
            explode(col("tk")).as("tok"))
          .groupBy("doc_id", "lang_guess", "ntok", "tok")
          .agg(count(lit(1)).as("m"))
        val freq = tf.filter(col("m") >= 1)
          .groupBy("tok").agg(sum(col("m")).as("cnt"))
        val total = freq.agg(sum(col("cnt")).as("n"))
        val scored = tf.join(broadcast(freq), "tok").crossJoin(broadcast(total))
          .select(col("doc_id"), col("lang_guess"), col("ntok"), col("m"),
            (col("m").cast("double") *
              log(col("cnt").cast("double") / col("n").cast("double")))
              .as("mlnp"))
          .groupBy("doc_id", "lang_guess", "ntok")
          .agg(round(-(aggregate(sort_array(collect_list(col("mlnp"))),
              lit(0.0), (a, v) => a + v) / sum(col("m")).cast("double")), 6)
            .as("nll"))
          .withColumn("nll_u", round(col("nll") * 1e6, 0).cast("long"))
        val means = scored.groupBy("lang_guess")
          .agg((sum(col("nll_u")).cast("double") /
            count(lit(1)).cast("double") / 1e6).as("mean_nll"))
        scored.join(broadcast(means), Seq("lang_guess"))
          .withColumn("bucket",
            when(col("nll") <= col("mean_nll") * 0.99, "head")
              .when(col("nll") >= col("mean_nll") * 1.01, "tail")
              .otherwise("middle"))
          .groupBy("lang_guess", "bucket")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            round(sum(col("nll_u")).cast("double") /
              count(lit(1)).cast("double") / 1e6, 6).as("avg_nll"))
          .orderBy("lang_guess", "bucket")
          .count()
      }
      time("y_checkpoint_base")(variant())
      spark.stop(); return
    }
    if (sys.env.get("SCRATCH_Q").contains("_langidprof")) {
      def time(tag: String)(f: => Long): Unit =
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = f
          println(f"[langidprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      time("z_current")(
        graft.SparkEntry.queries("text_langid_nb")(spark, sfDir).count())
      def variant(ckBase: Boolean, ckDtm: Boolean): Long = {
        val base0 = Tables.load(spark, sfDir, "documents")
          .withColumn("tk", TextOps.tokens(col("text")))
          .filter(size(col("tk")) > 0)
          .select(col("doc_id"), col("lang"), col("tk"))
        val base = if (ckBase) base0.localCheckpoint() else base0
        val dtm0 = base
          .select(col("doc_id"), col("lang"), explode(col("tk")).as("w"))
          .groupBy("doc_id", "lang", "w").agg(count(lit(1)).as("m"))
        val dtm = if (ckDtm) dtm0.localCheckpoint() else dtm0
        val lt = dtm.groupBy(col("lang").as("l"), col("w")).agg(sum(col("m")).as("c"))
        val tl = lt.groupBy("l").agg(sum(col("c")).as("t"))
        val vs = lt.agg(countDistinct(col("w")).as("v"))
        val docLang = dtm.select("doc_id", "lang").distinct()
        val pri = docLang.groupBy(col("lang").as("l")).agg(count(lit(1)).as("nd"))
        val nda = pri.agg(sum(col("nd")).as("ndall"))
        val langs = tl.join(pri, "l").crossJoin(broadcast(nda))
          .crossJoin(broadcast(vs))
        val terms = dtm.crossJoin(broadcast(langs))
          .join(broadcast(lt), Seq("l", "w"), "left")
          .select(col("doc_id"), col("lang"), col("l"),
            (col("m").cast("double") *
              log((coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
                (col("t") + col("v")).cast("double"))).as("term"),
            col("nd"), col("ndall"))
        val pl = terms
          .groupBy(col("doc_id"), col("lang"), col("l"), col("nd"), col("ndall"))
          .agg(round(
            graft.core.Exact.fsum(col("term") / lit(4.0)) * lit(4.0) +
              log(col("nd").cast("double") / col("ndall").cast("double")), 6)
            .as("w8"))
        pl.groupBy("doc_id", "lang")
          .agg(min(struct(negate(col("w8")).as("nw"), col("l").as("g"))).as("mm"))
          .select(col("lang"), col("mm.g").as("guess"))
          .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
          .orderBy("lang", "guess")
          .count()
      }
      time("y_ck_dtm")(variant(ckBase = false, ckDtm = true))
      time("x_ck_base")(variant(ckBase = true, ckDtm = false))
      time("w_ck_both")(variant(ckBase = true, ckDtm = true))
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
