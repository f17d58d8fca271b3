package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ShingleDf.capRare: the rare-shingle df cap that keeps near-dup
  * candidate generation non-quadratic — a key past the cap loses ALL
  * its rows (generates no candidates), keys at or under it keep every
  * row, and the plan stays window-free with the anti join build side
  * fed by an aggregate (no broadcast, no sort). */
class ShingleDfSpec extends SparkSpec {

  test("caps heavy-hitter keys, keeps rare ones intact") {
    val s = spark
    import s.implicits._
    // key 100 appears in 5 docs (hot for cap=4), key 200 in 4 (at the
    // cap), key 300 in 1
    val sh = ((1L to 5L).map(d => (d, 100L)) ++
      (1L to 4L).map(d => (d, 200L)) ++ Seq((9L, 300L)))
      .toDF("doc_id", "sh")
    val capped = ShingleDf.capRare(sh, "sh", cap = 4)
    val byKey = capped.groupBy("sh").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKey == Map(200L -> 4L, 300L -> 1L), s"got $byKey")
    // surviving rows are the ORIGINAL rows, schema intact
    assert(capped.columns.toSeq == Seq("sh", "doc_id"))
    assert(capped.filter(col("sh") === 300L).select("doc_id")
      .as[Long].collect().toSeq == Seq(9L))
  }

  test("plan: no window, no broadcast — hash-agg count + anti join") {
    val s = spark
    import s.implicits._
    val sh = (1L to 100L).map(d => (d, d % 7)).toDF("doc_id", "sh")
    val plan = ShingleDf.capRare(sh, "sh", cap = 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept back:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"hot set must not broadcast (size cliff):\n$plan")
    assert(plan.contains("LeftAnti"), s"anti join missing:\n$plan")
  }
}
