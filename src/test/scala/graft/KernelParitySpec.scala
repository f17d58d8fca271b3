package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorFunctions => V}

/** INTERPRETED-vs-CODEGEN parity for every custom kernel expression.
  *
  * The kernel specs (VectorExprSpec, HashKernelSpec) prove the
  * codegen'd results equal their HOF reference folds — but Spark can
  * also run any Expression through its interpreted `eval()` path
  * (codegen fallback on compile errors, interpreted projections,
  * `spark.sql.codegen.factoryMode` fleet rollouts). A divergence
  * between `nullSafeEval` and `doGenCode` is invisible to the default
  * suite because whole-stage codegen always wins locally. This spec
  * executes the full kernel battery twice — codegen on, then
  * whole-stage OFF + factoryMode NO_CODEGEN — and requires identical
  * rows, on real corpus data plus the empty/short edge rows. */
class KernelParitySpec extends SparkSpec {

  private def battery(): DataFrame = {
    val d = TestSpark.sf0001
    val docs = graft.core.Tables.load(spark, d, "documents")
      .limit(64)
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("tk"))
    val edges = {
      import spark.implicits._
      Seq((900001L, "", Seq.empty[String]),
          (900002L, "ab", Seq("ab")),
          (900003L, "one two", Seq("one", "two")))
        .toDF("doc_id", "text", "tk")
    }
    val text = docs.unionByName(edges).select(
      col("doc_id"),
      V.shingleMinhash(col("tk"), 3).as("mh"),
      V.shingleSimhash(col("tk"), 3).as("sh"),
      V.shingleStrings(col("tk"), 3).as("ss"),
      V.shingleHashes(col("tk"), 3).as("hs"),
      V.tokenTopCount(col("tk")).as("tc"),
      call_function("winnow_fingerprints",
        V.shingleHashes(col("tk"), 3), lit(4)).as("wf"),
      call_function("block_mean_code", col("text")).as("bm"),
      V.cdcChunks(col("tk"), 4, 16).as("cc"),
      V.spanCorrupt(col("doc_id").cast("string"), col("tk")).as("sc"))
    val e = graft.core.Tables.load(spark, d, "embeddings").limit(64)
      .select(col("vec_id"), col("embedding"))
    val vecs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("doc_id"),
        V.fdot(col("a.embedding"), col("b.embedding")).as("fd"),
        V.vd2(col("a.embedding"), col("b.embedding")).as("d2"))
    val sparse = {
      import spark.implicits._
      Seq((910001L, Seq(("a", 0.5), ("c", 2.0)), Seq(("a", 1.5), ("b", 9.0))),
          (910002L, Seq.empty[(String, Double)], Seq(("x", 1.0))),
          (910003L, Seq(("k", 1.25)), Seq(("k", -2.5))))
        .toDF("doc_id", "pa", "pb")
        .select(col("doc_id"),
          V.sparseDot(
            expr("transform(pa, x -> struct(x._1 AS w, x._2 AS w8))"),
            expr("transform(pb, x -> struct(x._1 AS w, x._2 AS w8))")).as("sd"))
    }
    text.join(vecs, Seq("doc_id"), "full_outer")
      .join(sparse, Seq("doc_id"), "full_outer")
      .orderBy("doc_id")
  }

  test("all kernels: interpreted eval() equals the codegen'd result") {
    val withCodegen = battery().collect().toSeq
    val ws = spark.conf.get("spark.sql.codegen.wholeStage")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = battery().collect().toSeq
      assert(interpreted.map(_.toString) == withCodegen.map(_.toString),
        "interpreted eval() diverged from doGenCode")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }
}
