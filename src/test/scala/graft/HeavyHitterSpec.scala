package graft

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Misra-Gries heavy-hitters sketch: exactness at capacity, the
  * classic under-capacity guarantees, merge-tree invariance, and the
  * streaming (bounded-state global agg) path. */
class HeavyHitterSpec extends SparkSpec {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("capacity >= distinct keys -> counts are exact on any layout") {
    val s = spark
    import s.implicits._
    val xs = Seq.tabulate(5000)(i => s"k${i % 17}")
    val mg = udaf(new graft.agg.MisraGries(32), Encoders.STRING)
    for (parts <- Seq(1, 7)) {
      val out = xs.toDF("x").repartition(parts)
        .agg(mg(col("x")).as("mg"))
        .select(explode(col("mg.counters"))).as[(String, Long)]
        .collect().toMap
      assert(out == exactCounts(xs))
    }
  }

  test("null inputs are ignored, not counted or crashed on") {
    val s = spark
    import s.implicits._
    val mg = udaf(new graft.agg.MisraGries(8), Encoders.STRING)
    val out = Seq("a", null, "a", null, "b").toDF("x")
      .agg(mg(col("x")).as("mg"))
      .select(explode(col("mg.counters"))).as[(String, Long)]
      .collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 1L))
  }

  test("under capacity: underestimates within n/(k+1); heavy keys survive") {
    val s = spark
    import s.implicits._
    // zipf-ish skew over 200 distinct keys, capacity 16
    val xs = (0 until 200).flatMap(i => Seq.fill(1 + 4000 / (i + 1))(s"w$i"))
    val k = 16
    val truth = exactCounts(xs)
    val n = xs.size.toLong
    val bound = n / (k + 1)
    val mg = udaf(new graft.agg.MisraGries(k), Encoders.STRING)
    val Row(counters: Map[String, Long] @unchecked, seen: Long) =
      xs.toDF("x").repartition(13)
        .agg(mg(col("x")).as("mg"))
        .select(col("mg.counters"), col("mg.n")).head
    assert(seen == n)
    assert(counters.size <= k)
    counters.foreach { case (key, est) =>
      assert(est <= truth(key), s"$key overestimated: $est > ${truth(key)}")
      assert(truth(key) - est <= bound,
        s"$key error ${truth(key) - est} exceeds n/(k+1)=$bound")
    }
    // every key more frequent than n/(k+1) must be present
    truth.filter(_._2 > bound).keys.foreach { key =>
      assert(counters.contains(key), s"heavy key $key evicted")
    }
  }

  test("merge of partition summaries preserves the bound (many partitions)") {
    val s = spark
    import s.implicits._
    val xs = (0 until 100).flatMap(i => Seq.fill(1 + 2000 / (i + 1))(s"m$i"))
    val k = 8
    val truth = exactCounts(xs)
    val bound = xs.size.toLong / (k + 1)
    val mg = udaf(new graft.agg.MisraGries(k), Encoders.STRING)
    // 97 partitions -> a deep merge tree of capped summaries
    val counters = xs.toDF("x").repartition(97)
      .agg(mg(col("x")).as("mg"))
      .select(explode(col("mg.counters"))).as[(String, Long)]
      .collect().toMap
    assert(counters.size <= k)
    counters.foreach { case (key, est) =>
      assert(est <= truth(key) && truth(key) - est <= bound)
    }
  }

  test("streaming global heavy hitters: bounded state, exact at capacity") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[String]
    val mg = udaf(new graft.agg.MisraGries(32), Encoders.STRING)
    val q = in.toDF().toDF("x")
      .agg(mg(col("x")).as("mg"))
      .select(explode(col("mg.counters")).as(Seq("tok", "est")))
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      in.addData(Seq.fill(10)("a") ++ Seq.fill(3)("b"): _*)
      q.processAllAvailable()
      in.addData(Seq.fill(5)("a") ++ Seq.fill(7)("c"): _*)
      q.processAllAvailable()
      val out = s.table("hh_stream").as[(String, Long)].collect().toMap
      assert(out == Map("a" -> 15L, "b" -> 3L, "c" -> 7L))
    } finally q.stop()
  }
}
