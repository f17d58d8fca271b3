package graft

import org.apache.spark.sql.functions._

/** The injected optimizer rule must fire (plan shows exists, not
  * size(filter)) and preserve semantics. */
class RuleSpec extends SparkSpec {

  test("size(filter(...)) > 0 is rewritten to exists(...) by the injected rule") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf0001, "documents")
      .withColumn("tk", graft.functions.TextOps.tokens(col("text")))
    val q = docs.select(
      (size(filter(col("tk"), t => t === "the")) > 0).as("has_the"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("exists("), optimized)
    assert(!optimized.contains("size(filter("), optimized)
    // semantics preserved vs the unoptimized formulation
    val viaExists = q.filter(col("has_the")).count()
    val viaContains = docs.filter(array_contains(col("tk"), "the")).count()
    assert(viaExists == viaContains)
  }

  test("size(filter(...)) = 0 becomes NOT exists and agrees with the positive form") {
    val docs = graft.core.Tables.load(spark, TestSpark.sf0001, "documents")
      .withColumn("tk", graft.functions.TextOps.tokens(col("text")))
    val none = docs.filter(size(filter(col("tk"), t => t === "the")) === 0).count()
    val some = docs.filter(size(filter(col("tk"), t => t === "the")) > 0).count()
    assert(none + some == docs.count())
  }
}
