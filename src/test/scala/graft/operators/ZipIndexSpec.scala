package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ZipIndex — the distributed replacement for unpartitioned
  * row_number/ntile windows. The specs pin it AGAINST the window
  * forms (the semantics the oracles encode) on multi-partition input,
  * so the two-pass offset arithmetic can't drift from
  * `row_number() OVER (ORDER BY ...)` / `ntile(k) OVER (...)`. */
class ZipIndexSpec extends SparkSpec {
  import spark.implicits._

  test("withIndex equals row_number()-1 in the same total order") {
    // deliberately unsorted, multi-partition, non-contiguous keys
    val df = spark.range(0, 997).select(
      (pmod(col("id") * 7919, lit(997))).as("k"),
      (col("id") % 13).as("v")).repartition(8)
    val (indexed, total) = ZipIndex.withIndex(df, "idx", col("k"))
    assert(total === 997L)
    val expect = df.withColumn("idx",
      row_number().over(Window.orderBy("k")).cast("long") - 1L)
    assert(indexed.select("k", "v", "idx").except(expect).isEmpty &&
      expect.except(indexed.select("k", "v", "idx")).isEmpty,
      "two-pass index diverged from row_number semantics")
    // dense 0..N-1: min 0, max N-1, distinct N
    val stats = indexed.agg(min("idx"), max("idx"), countDistinct("idx"))
      .as[(Long, Long, Long)].head()
    assert(stats === ((0L, 996L, 997L)))
  }

  test("ntileBy equals ntile(k) over the same order, N % k != 0") {
    // 103 rows into 4 buckets: 3 buckets of 26, 1 of 25 — exercises
    // the remainder split both sides of the cut
    val df = spark.range(0, 103).select(
      pmod(col("id") * 31, lit(103)).as("k")).repartition(5)
    val got = ZipIndex.ntileBy(df, 4, "q", col("k"))
    val expect = df.withColumn("q",
      ntile(4).over(Window.orderBy("k")))
    assert(got.select("k", "q").except(expect).isEmpty &&
      expect.except(got.select("k", "q")).isEmpty,
      "closed-form bucket split diverged from ntile semantics")
  }

  test("null order keys index deterministically (ASC = NULLS FIRST)") {
    val df = Seq[(java.lang.Long, String)]((null, "n1"), (5L, "a"),
      (null, "n2"), (1L, "b")).toDF("k", "tag").repartition(3)
    // tie-break the two nulls on tag so the total order stays unique
    val (indexed, total) = ZipIndex.withIndex(df, "idx", col("k"), col("tag"))
    assert(total === 4L)
    val got = indexed.orderBy("idx").select("tag").as[String].collect().toSeq
    assert(got === Seq("n1", "n2", "b", "a"),
      "null keys must sort first, exactly as row_number over ASC order")
  }

  test("ntileBy == ntile(k) across bucket counts and remainders") {
    // sweep k so every remainder class of the closed-form split is
    // exercised (cut inside/at/after the big buckets)
    for (n <- Seq(17, 40); k <- Seq(2, 3, 5, 8)) {
      val df = spark.range(0, n).select(pmod(col("id") * 13, lit(n)).as("x"))
        .repartition(3)
      val got = ZipIndex.ntileBy(df, k, "q", col("x"))
      val expect = df.withColumn("q", ntile(k).over(Window.orderBy("x")))
      assert(got.select("x", "q").except(expect).isEmpty &&
        expect.except(got.select("x", "q")).isEmpty,
        s"ntileBy($k) over $n rows diverged from ntile")
    }
  }

  test("ntileBy with fewer rows than buckets assigns bucket = rank") {
    val df = Seq(30, 10, 20).toDF("k")
    val got = ZipIndex.ntileBy(df, 7, "q", col("k"))
      .orderBy("k").as[(Int, Int)].collect().toSeq
    assert(got === Seq((10, 1), (20, 2), (30, 3)))
  }

  test("catalog queries match their window-form twins at sf0.001") {
    val d = TestSpark.sf0001
    val zi = graft.SparkEntry.queries("rel_zip_index")(spark, d)
    val ziW = spark.read.parquet(s"$d/orders.parquet").select("o_orderkey")
      .withColumn("idx", row_number().over(Window.orderBy("o_orderkey")) - 1)
      .orderBy("o_orderkey").limit(100)
    assert(zi.collect().toSeq === ziW.collect().toSeq)

    val nt = graft.SparkEntry.queries("agg_ntile")(spark, d)
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ntW = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey"), ntile(4).over(w).as("quartile"))
      .orderBy("o_orderkey")
    assert(nt.collect().toSeq === ntW.collect().toSeq)
  }
}
