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
    if (sys.env.get("SCRATCH_Q").contains("_graphprof")) {
      import org.apache.spark.sql.{Column, DataFrame}
      import graft.core.Exact
      def time(tag: String)(f: => Long): Unit =
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = f
          println(f"[graphprof] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
        }
      val docs = Tables.load(spark, sfDir, "documents")
      val nrow = docs.agg(count(lit(1)).as("n_nodes"))
      val nodes = docs.select(col("doc_id")).crossJoin(broadcast(nrow))
      val edges = nodes.filter(col("doc_id") % 7 =!= 0)
        .withColumn("ds", array_distinct(filter(
          concat(array(col("doc_id") % 10),
            transform(sequence(lit(1), lit(3)),
              j => (pmod(col("doc_id"), col("n_nodes")) * 31 + j * 17) %
                col("n_nodes"))),
          x => x =!= col("doc_id"))))
        .select(col("doc_id").as("src"), size(col("ds")).as("deg"),
          explode(col("ds")).as("dst"))
      // kcore variants
      def kcore(ckUnd: Boolean, ckAct: Boolean): Long = {
        val K = 3
        val und0 = edges.select(col("src"), col("dst"))
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        val und = if (ckUnd) und0.localCheckpoint() else und0
        def coreDeg(active: DataFrame): DataFrame = und
          .join(active.select(col("doc_id").as("src")), Seq("src"))
          .join(active.select(col("doc_id").as("dst")), Seq("dst"))
          .groupBy("src").agg(count(lit(1)).as("deg"))
        var active = nodes.select(col("doc_id"))
        for (_ <- 1 to 3) {
          val nxt = coreDeg(active).filter(col("deg") >= K)
            .select(col("src").as("doc_id"))
          active = if (ckAct) nxt.localCheckpoint() else nxt
        }
        val fdeg = coreDeg(active)
        nodes.select(col("doc_id"))
          .join(fdeg.select(col("src").as("doc_id"), col("deg").as("deg_core")),
            Seq("doc_id"), "left")
          .select(col("doc_id"), col("deg_core").isNotNull.as("in_core3"),
            coalesce(col("deg_core"), lit(0L)).as("deg_core"))
          .orderBy("doc_id").count()
      }
      time("kcore_z_current")(
        graft.SparkEntry.queries("graph_kcore")(spark, sfDir).count())
      time("kcore_y_undck_actck")(kcore(ckUnd = true, ckAct = true))
      time("kcore_x_undck_noact")(kcore(ckUnd = true, ckAct = false))
      time("kcore_w_nobarriers")(kcore(ckUnd = false, ckAct = false))
      // ppr variants
      def ppr(ckRanks: Boolean, ckBase: Boolean): Long = {
        val ns = nodes.filter(col("doc_id") % 11 === 1)
          .agg(count(lit(1)).as("ns"))
        val base0 = nodes.crossJoin(broadcast(ns))
          .withColumn("p",
            when(col("doc_id") % 11 === 1, lit(1.0) / col("ns"))
              .otherwise(lit(0.0)))
        val base = if (ckBase) base0.localCheckpoint() else base0
        var ranks = base.select(col("doc_id"), col("p"), col("p").as("r"))
        for (_ <- 1 to 3) {
          val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
            .groupBy(col("dst")).agg(Exact.fsum(col("r") / col("deg")).as("s"))
          val dm = ranks.filter(col("doc_id") % 7 === 0)
            .agg(Exact.fsum(col("r")).as("dm"))
          val nxt = base.join(contrib, base("doc_id") === contrib("dst"), "left")
            .crossJoin(broadcast(dm))
            .select(base("doc_id"), col("p"),
              (lit(0.15) * col("p") + lit(0.85) *
                (coalesce(col("s"), lit(0.0)) + col("dm") * col("p"))).as("r"))
          ranks = if (ckRanks) nxt.localCheckpoint() else nxt
        }
        ranks.filter(col("r") > lit(0.0))
          .select(col("doc_id"), col("r").as("ppr"),
            (col("doc_id") % 11 === 1).as("seed"))
          .orderBy(col("ppr").desc, col("doc_id")).limit(25).count()
      }
      time("ppr_z_current")(
        graft.SparkEntry.queries("graph_ppr")(spark, sfDir).count())
      time("ppr_y_nock")(ppr(ckRanks = false, ckBase = false))
      time("ppr_x_baseck_only")(ppr(ckRanks = false, ckBase = true))
      time("ppr_w_baseck_rankck")(ppr(ckRanks = true, ckBase = true))
      time("dr_z_current")(
        graft.SparkEntry.queries("graph_domainrank")(spark, sfDir).count())
      // domainrank variants: which of the two one-time checkpoints pay?
      def domainrank(ckDe: Boolean, ckBase: Boolean): Long = {
        val dom = docs.select(col("doc_id"), col("source"))
        val de0 = edges
          .join(dom.select(col("doc_id").as("src"), col("source").as("sdom")),
            Seq("src"))
          .join(dom.select(col("doc_id").as("dst"), col("source").as("ddom")),
            Seq("dst"))
          .filter(col("sdom") =!= col("ddom"))
          .groupBy("sdom", "ddom").agg(count(lit(1)).as("w"))
        val de = if (ckDe) de0.localCheckpoint() else de0
        val outw = de.groupBy("sdom").agg(sum(col("w")).as("outw"))
        val doms = dom.select(col("source").as("dm")).distinct()
        val nd = doms.agg(count(lit(1)).as("nd"))
        val base0 = doms.crossJoin(broadcast(nd))
        val base = if (ckBase) base0.localCheckpoint() else base0
        var ranks = base.select(col("dm"), (lit(1.0) / col("nd")).as("r"))
        for (_ <- 1 to 3) {
          val contrib = de.join(outw, Seq("sdom"))
            .join(ranks, col("sdom") === col("dm"))
            .groupBy(col("ddom"))
            .agg(Exact.fsum(col("r") * col("w") / col("outw")).as("s"))
          val dmass = ranks.join(outw, ranks("dm") === outw("sdom"), "left_anti")
            .agg(Exact.fsum(col("r")).as("dmass"))
          ranks = base.join(contrib, base("dm") === contrib("ddom"), "left")
            .crossJoin(broadcast(dmass))
            .select(col("dm"),
              (lit(0.15) / col("nd") + lit(0.85) *
                (coalesce(col("s"), lit(0.0)) +
                  coalesce(col("dmass"), lit(0.0)) / col("nd"))).as("r"))
        }
        ranks.join(outw, ranks("dm") === outw("sdom"), "left")
          .select(col("dm").as("domain"), col("r").as("rank"),
            coalesce(col("outw"), lit(0L)).as("out_links"))
          .orderBy(col("rank").desc, col("domain")).count()
      }
      time("dr_y_deck_nobase")(domainrank(ckDe = true, ckBase = false))
      time("dr_x_nock")(domainrank(ckDe = false, ckBase = false))
      time("pagerank_control")(
        graft.SparkEntry.queries("graph_pagerank")(spark, sfDir).count())
      spark.stop(); return
    }
    if (sys.env.get("SCRATCH_Q").contains("_scanbytes")) {
      // corpus-pass accounting: total task input bytes across a query's
      // jobs / bytes of one full scan = effective number of passes
      val target = sys.env.getOrElse("SCRATCH_SCAN_TARGET", "emb_probe")
      val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
      val recs = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
            recs.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
          }
        }
      }
      def measure(tag: String)(f: => Long): Unit = {
        f // warm (codegen, broadcast relations) off the meter
        spark.sparkContext.addSparkListener(listener)
        bytes.set(0L); recs.set(0L)
        val t0 = System.nanoTime()
        val n = f
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; give the bus a moment
        Thread.sleep(1500)
        spark.sparkContext.removeSparkListener(listener)
        println(f"[scanbytes] $tag ${bytes.get} bytes ${recs.get} records $sec%.2f s ($n rows)")
      }
      val tbl = if (target.startsWith("emb")) "embeddings" else "documents"
      measure("one_full_scan")(
        Tables.load(spark, sfDir, tbl).count())
      measure(target)(
        graft.SparkEntry.queries(target)(spark, sfDir).count())
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
