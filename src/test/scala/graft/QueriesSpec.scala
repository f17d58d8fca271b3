package graft

import org.apache.spark.sql.functions._

/** Contract + invariant tests over the query catalog at sf0.001.
  * The cross-engine value-exactness gate is the driver's DuckDB
  * compare (tools/check.py locally); these specs assert structural
  * invariants and reference-derived golden properties. */
class QueriesSpec extends SparkSpec {
  private val d = TestSpark.sf0001

  test("entry (SpendReport flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("query names are unique across groups") {
    val all = SparkEntry.groups.flatMap(_.queries.keys)
    assert(all.size == all.distinct.size)
  }

  test("every query runs and is non-degenerate at sf0.001") {
    // legitimately 0 rows at this SF (verified against the DuckDB oracle).
    // join_anti / pat_fraud / pat_nfails were de-vacuated in round 11
    // (thresholds recalibrated so each detector finds genuine matches
    // at every SF) and are now REQUIRED to be non-empty here.
    val empties = Seq("rel_except_all")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, d).count()
      if (!empties.contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("approx_count_distinct within 5% of exact (HLL++ invariant)") {
    // the query now emits the invariant itself (approx_ok), which the
    // DuckDB oracle pins to TRUE; assert it per group here too
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> r.getBoolean(2))
    assert(rows.nonEmpty)
    rows.foreach { case (k, ok) =>
      assert(ok, s"HLL++ estimate for '$k' drifted past 5% of exact")
    }
  }

  test("manual HLL (p=6) within 20% of exact per event_type") {
    // 64 buckets -> ~1.04/sqrt(64) = 13% standard error; 20% bound
    // keeps the test deterministic-but-meaningful at sf0.001
    val est = SparkEntry.queries("agg_hll_manual")(spark, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.core.Tables.load(spark, d, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex) / ex < 0.20,
        s"$k: est=${est(k)} exact=$ex")
    }
  }

  test("semdedup keeps the lowest vec_id of every cell (anchor invariant)") {
    // the keep-one rule drops only vec_ids that have a LOWER same-cell
    // near-dup, so each cell's minimum vec_id can never be dropped
    val out = SparkEntry.queries("emb_semdedup")(spark, d)
    val minPerCell = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    val droppedAnchors = out.filter(!col("kept"))
      .join(minPerCell, Seq("cell", "vec_id")).count()
    assert(droppedAnchors == 0)
    assert(out.filter(col("kept")).count() > 0)
  }

  test("decontam flags exactly the docs at/above the hit threshold") {
    val out = SparkEntry.queries("pipe_decontam")(spark, d)
    assert(out.filter(col("contaminated") =!= (col("n_hits") >= 5)).count() == 0)
    // the benchmark source itself never appears in the output
    val docs = graft.core.Tables.load(spark, d, "documents")
      .filter(col("source") === "src0").select("doc_id")
    assert(out.join(docs, "doc_id").count() == 0)
  }

  test("count-min sketch never underestimates (CM bound)") {
    val out = SparkEntry.queries("agg_cms")(spark, d)
    assert(out.filter(col("est") < col("exact")).count() == 0)
  }

  test("bloom filter has no false negatives") {
    val out = SparkEntry.queries("agg_bloom")(spark, d)
    assert(out.filter(col("exact_member") && !col("bloom_member")).count() == 0)
  }

  test("dup-cluster labels are canonical: rep <= doc_id, pairs agree") {
    val labels = SparkEntry.queries("dd_cluster")(spark, d)
    assert(labels.filter(col("rep") > col("doc_id")).count() == 0)
    // every near-dup pair ends in the same cluster (short chains close
    // within the 3 propagation rounds)
    val pairs = SparkEntry.queries("dd_simhash")(spark, d)
    val disagree = pairs
      .join(labels.select(col("doc_id").as("da"), col("rep").as("ra")), "da")
      .join(labels.select(col("doc_id").as("db"), col("rep").as("rb")), "db")
      .filter(col("ra") =!= col("rb")).count()
    assert(disagree == 0)
  }

  test("as-of join matches the most recent prior click per purchase") {
    // golden micro-check: recompute one user's enrichment directly
    val e = graft.core.Tables.load(spark, d, "events")
    val out = SparkEntry.queries("join_asof")(spark, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts").collect()
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "value").collect()
      .groupBy(_.getLong(0))
    val expect = purchases.take(20).map { p =>
      val prior = clicks.getOrElse(p.getLong(1), Array.empty)
        .filter(c => !c.getTimestamp(1).after(p.getTimestamp(2)))
      val v = if (prior.isEmpty) null
        else prior.maxBy(_.getTimestamp(1).getTime).get(2)
      p.getLong(0) -> v
    }.toMap
    val got = out.filter(col("event_id").isin(expect.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.get(2)).toMap
    assert(got == expect)
  }

  test("MaxMin aggregator equals built-in min/max") {
    val c = graft.core.Tables.load(spark, d, "customer")
    val viaUdaf = SparkEntry.queries("agg_udaf_maxmin")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val builtin = c.groupBy("c_mktsegment")
      .agg(max("c_acctbal"), min("c_acctbal")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(viaUdaf == builtin)
  }

  test("minhash est correlates with true jaccard on known near-dups") {
    val jac = SparkEntry.queries("dd_jaccard")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val mh = SparkEntry.queries("dd_minhash")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val strong = jac.filter(_._2 >= 0.8).keySet
    assert(strong.nonEmpty)
    // every strongly-similar pair should be caught by LSH with high est
    val missed = strong.filterNot(p => mh.getOrElse(p, 0.0) >= 0.5)
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }
}
