package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows`, which is `private[sql]` — the
  * standard technique Spark extension libraries use to materialize a
  * DataFrame from a custom LogicalPlan (the rest of the engine lives
  * in the `graft` namespace; only this two-line bridge sits in
  * Spark's). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
