package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy for repeated fact-fact
  * joins at scale (SURVEY §2/§4: REPARTITION_HASH join without the
  * per-query shuffle). Writing both sides bucketed by the join key
  * lets the join run with ZERO shuffle exchanges. */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    val d = TestSpark.sf0001
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    graft.core.Tables.load(spark, d, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.core.Tables.load(spark, d, "customer")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      val plan = joined.queryExecution.executedPlan.toString
      val shufflesBeforeAgg = plan.split("HashAggregate").last
      assert(!shufflesBeforeAgg.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      // and it still computes the right thing
      assert(joined.collect().map(_.getLong(1)).sum == 1500L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
