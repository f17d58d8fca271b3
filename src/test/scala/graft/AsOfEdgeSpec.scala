package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Edge cases for the custom AsOfJoinExec — empty sides and
  * no-match keys are where hand-written physical operators break. */
class AsOfEdgeSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Long, Double)], vcol: String) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "t", vcol)
      .select(col("k"), timestamp_micros(col("t") * 1000).as("ts"), col(vcol))
  }

  test("native exec equals the window formulation on random inputs") {
    // the custom physical operator and the union+window formulation
    // implement the same left-outer inclusive as-of contract; random
    // keyed timelines (with duplicate timestamps and no-match keys)
    // must agree row-for-row
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      def timeline(n: Int): Seq[(Long, Long, Double)] =
        Seq.fill(n)((1L + rnd.nextInt(6), rnd.nextInt(40).toLong,
          math.rint(rnd.nextDouble() * 1000)))
      val left = mk(timeline(60), "lv")
      // unique right (key, ts): equal-ts right rows are a tie the two
      // formulations may break differently (window takes the last by
      // tieBreak, the merge exec the last in sort order) — the CONTRACT
      // only fixes the inclusive boundary, so dedup like join_asof does
      val right = mk(timeline(50), "rv")
        .groupBy("k", "ts").agg(max("rv").as("rv"))
      val a = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
          Seq("rv"), lit(0)).selectExpr("k", "ts", "lv", "rv")
        .collect().map(_.toSeq).toList
      val b = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts",
          Seq("rv")).selectExpr("k", "ts", "lv", "rv")
        .collect().map(_.toSeq).toList
      def norm(xs: List[Seq[Any]]) = xs.sortBy(_.mkString("|"))
      assert(norm(a) == norm(b), s"seed=$seed: window vs native diverged")
    }
  }

  test("empty right side: every left row survives with null value") {
    val left = mk(Seq((1L, 1000L, 0.0), (2L, 2000L, 0.0)), "x")
    val right = mk(Seq.empty, "v")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
  }

  test("empty left side: empty output") {
    val left = mk(Seq.empty, "x")
    val right = mk(Seq((1L, 1000L, 9.0)), "v")
    assert(AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().isEmpty)
  }

  test("tolerance: boundary inclusive, stale match nulls, newer right recovers") {
    // right values at t=1000 and t=5000 for key 1
    val right = mk(Seq((1L, 1000L, 10.0), (1L, 5000L, 50.0)), "v")
    val left = mk(Seq(
      (1L, 1000L, 0.0),  // exact match, age 0        -> 10.0
      (1L, 3000L, 0.0),  // age 2000 == tol            -> 10.0 (inclusive)
      (1L, 3001L, 0.0),  // age 2001 > tol             -> null (stale)
      (1L, 5500L, 0.0),  // newer right at 5000 in tol -> 50.0 (recovered)
      (1L, 9000L, 0.0)), // age 4000 > tol             -> null again
      "x")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts",
        Seq("v"), toleranceMs = 2000L)  // t values above are in ms
      .selectExpr("k", "unix_millis(ts) AS t", "v")
      .collect().sortBy(_.getLong(1))
      .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    assert(out.toSeq == Seq(Some(10.0), Some(10.0), None, Some(50.0), None))
    // tolerance 0: only exact-timestamp matches survive
    val exact = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts",
        Seq("v"), toleranceMs = 0L)
      .selectExpr("unix_millis(ts) AS t", "v").collect()
      .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(exact == Map(1000L -> true, 3000L -> false, 3001L -> false,
      5500L -> false, 9000L -> false))
    // negative tolerance = unlimited (the default contract): every
    // left row here has SOME earlier right row, so no NULLs at all
    val unl = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .select("v").collect()
    assert(unl.length == 5 && unl.forall(!_.isNullAt(0)))
  }

  test("key with rights only after the left ts gets null; exact-ts match is inclusive") {
    val left = mk(Seq((1L, 1000L, 0.0), (2L, 5000L, 0.0)), "x")
    val right = mk(Seq((1L, 2000L, 9.0),   // after left ts -> no match
                       (2L, 5000L, 7.0)),  // exactly at left ts -> match
      "v")
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some(7.0)))
  }

  test("multiple value columns and interleaved keys") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 3000L), (1L, 6000L), (2L, 3000L)).toDF("k", "t")
      .select(col("k"), timestamp_micros(col("t") * 1000).as("ts"))
    val right = Seq((1L, 1000L, 1.0, "a"), (1L, 5000L, 2.0, "b"),
        (2L, 2000L, 3.0, "c")).toDF("k", "t", "v", "tag")
      .select(col("k"), timestamp_micros(col("t") * 1000).as("ts"),
        col("v"), col("tag"))
    val out = AsOfJoin.asOfNative(left, right, Seq("k"), "ts", "ts",
        Seq("v", "tag")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2), r.getString(3)))
      .toSet
    assert(out == Set((1L, 3000L, 1.0, "a"), (1L, 6000L, 2.0, "b"),
      (2L, 3000L, 3.0, "c")))
  }
}
