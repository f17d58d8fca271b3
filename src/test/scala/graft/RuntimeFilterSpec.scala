package graft

import org.apache.spark.sql.functions._

/** Spark's runtime bloom-filter injection (semi-join reduction) — the
  * 100 TB mechanism that builds a bloom filter from a join side with a
  * selective predicate and applies it to the other side BELOW that
  * side's shuffle, so pruned rows never pay exchange cost. Thresholds
  * are lowered to test scale here; the production defaults (10 GB
  * application-side scan, 10 MB creation side) gate the exact same
  * rule, so this pins that the engine's join shapes stay eligible:
  * shuffle joins with the selective side small and un-broadcast. */
class RuntimeFilterSpec extends SparkSpec {

  test("dim-side bloom filter prunes the fact side below its shuffle") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = TestSpark.sf0001
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val ord = spark.read.parquet(s"$d/orders.parquet")
        .filter(col("o_totalprice") > 100000)
      // the application side has its own shuffle (the pre-aggregate) —
      // the injection rule only fires when pruning saves exchange work
      val liAgg = li.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val j = liAgg
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("q").as("sq"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("bloom_filter_agg"),
        "no bloom filter built from the selective dim side")
      assert(p.contains("might_contain"),
        "bloom filter not applied on the fact side")
      // the filtered plan still computes the right join (smoke)
      assert(j.count() > 0)
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
  }
}
