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

  /** Idempotently install the engine's extensions into an EXISTING
    * session — defense for callers that build their own SparkSession
    * instead of core.Sessions (injectFunction only works at builder
    * time; the function registry lives behind private[sql]). */
  def ensurePrepared(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val registry = cs.sessionState.functionRegistry
    val ident = new org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot")
    if (!registry.functionExists(ident)) {
      registry.registerFunction(ident,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.FloatDotProduct", "float_dot"),
        args => graft.functions.FloatDotProduct(args(0), args(1)))
    }
    if (!cs.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.AsOfJoinStrategy]))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ new graft.plans.AsOfJoinStrategy
    if (!cs.experimental.extraOptimizations.contains(graft.plans.ExistsRewriteRule))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ graft.plans.ExistsRewriteRule
  }
}
