package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keeper.withKeeper: min-id-per-key as hash-agg + null-safe join —
  * row-preserving (NULL keys included, the silent-drop bug of a plain
  * inner equi-join) and window-free. */
class KeeperSpec extends SparkSpec {

  test("null keys form one group and are not dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("x")), (2L, Some("x")),
      (3L, None), (4L, None), (5L, Some("y")))
      .toDF("doc_id", "k")
    val out = Keeper.withKeeper(df, col("k"), "doc_id")
    // every input row survives — including both NULL-keyed ones
    assert(out.count() === 5L)
    val keepers = out.collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("keeper"))).toMap
    // NULLs group together (as PARTITION BY treats them): keeper = 3
    assert(keepers === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
  }

  test("plan: aggregate + shuffled hash join, no window") {
    val s = spark
    import s.implicits._
    val df = (1L to 50L).map(d => (d, (d % 5).toString)).toDF("doc_id", "k")
    val plan = Keeper.withKeeper(df, col("k"), "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window crept back:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"expected SHJ:\n$plan")
  }
}
