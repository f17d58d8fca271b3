package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The custom codegen'd FloatDotProduct must be bit-identical to the
  * higher-order-function fold it replaces, and reject wrong types at
  * analysis time. */
class VectorExprSpec extends SparkSpec {

  test("float_dot is bit-identical to the aggregate/zip_with fold") {
    val e = graft.core.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diffs = e.select(
        VectorFunctions.fdot(col("embedding"), col("embedding")).as("native"),
        hof.as("folded"))
      .filter(col("native") =!= col("folded")).count()
    assert(diffs == 0)
  }

  test("float_dot participates in whole-stage codegen") {
    val e = graft.core.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val plan = e.select(VectorFunctions.fdot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project [float_dot"), plan.take(500))
  }

  test("vec_d2 is bit-identical to the zip_with squared-distance fold") {
    val e = graft.core.Tables.load(spark, TestSpark.sf0001, "embeddings")
    // float vs double side: the kmeans assign shape
    val cv = transform(reverse(col("embedding")), x => x.cast("double"))
    val hof = aggregate(
      zip_with(col("embedding"), cv, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val diffs = e.select(
        VectorFunctions.vd2(col("embedding"), cv).as("native"),
        hof.as("folded"))
      .filter(col("native") =!= col("folded")).count()
    assert(diffs == 0)
    // float vs float side: the PQ subspace shape
    val hof2 = aggregate(
      zip_with(col("embedding"), reverse(col("embedding")),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val diffs2 = e.select(
        VectorFunctions.vd2(col("embedding"), reverse(col("embedding"))).as("native"),
        hof2.as("folded"))
      .filter(col("native") =!= col("folded")).count()
    assert(diffs2 == 0)
  }

  test("vec_d2 participates in whole-stage codegen") {
    val e = graft.core.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val plan = e.select(VectorFunctions.vd2(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_d2"), plan.take(500))
  }

  test("float_dot rejects non-float-array inputs at analysis time") {
    val bad = intercept[Exception] {
      graft.core.Tables.load(spark, TestSpark.sf0001, "part")
        .select(VectorFunctions.fdot(col("p_name"), col("p_name"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("array"))
  }
}
