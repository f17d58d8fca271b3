package graft

import org.apache.spark.sql.functions._

/** AQE's runtime skew-join splitting — the built-in complement to the
  * manual salted join (operators.Skew / join_skew): when one join key
  * dominates a shuffle partition, AQE splits that partition across
  * tasks at runtime and replicates the matching build side. This pins
  * that the engine's sort-merge joins stay eligible (thresholds are
  * lowered to test scale; production defaults gate the same
  * OptimizeSkewedJoin rule) — so at 100 TB a skewed fact-fact join is
  * handled by the runtime even where we did not pre-salt. */
class AqeSkewSpec extends SparkSpec {

  test("a hot join key is split at runtime: SortMergeJoin(skew=true)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carries 200k of 300k rows; 99 cold keys
      val left = spark.range(0, 300000).select(
        when(col("id") < 200000, 0L).otherwise(col("id") % 99 + 1).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 100)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right.hint("merge"), "k").groupBy("k").count()
      val rows = j.collect() // execute THIS plan so AQE finalizes it
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + plan.take(1500))
      // correctness through the split: hot key keeps every row
      val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m(0L) == 200000L)
      assert(m.size == 100 && m.filterKeys(_ != 0L).values.forall(_ > 0))
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
  }
}
