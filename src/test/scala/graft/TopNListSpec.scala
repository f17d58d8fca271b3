package graft

import org.apache.spark.sql.functions._

/** Top-N-list table aggregate: bounded buffer, emits the list. */
class TopNListSpec extends SparkSpec {

  test("top-3 list per group matches orderBy/limit, buffer stays bounded") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", 1.0), ("a", 9.0), ("a", 5.0), ("a", 7.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0)).toDF("k", "v").repartition(5)
    val top3 = udaf(graft.agg.Top3List)
    val got = df.groupBy("k").agg(top3(col("v")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(9.0, 7.0, 5.0))
    assert(got("b") == Seq(4.0, 2.0))
  }

  test("merge law: any partition split yields the same top-N") {
    import graft.agg.{Top3List, TopAcc}
    val xs = (1 to 50).map(i => (i * 37 % 101).toDouble)
    val whole = xs.foldLeft(Top3List.zero)(Top3List.reduce(_, _))
    (1 until xs.length by 7).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val merged = Top3List.merge(
        l.foldLeft(Top3List.zero)(Top3List.reduce(_, _)),
        r.foldLeft(Top3List.zero)(Top3List.reduce(_, _)))
      assert(Top3List.finish(merged) == Top3List.finish(whole))
    }
  }
}
