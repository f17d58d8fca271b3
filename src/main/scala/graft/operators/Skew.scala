package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper (SURVEY §4.2 / builder scale brief):
  * salt the skewed (big) side into `salts` sub-keys and replicate the
  * small side across all salt values, so one hot key spreads over
  * `salts` reducers instead of melting a single one.
  *
  * AQE's skew-join split (on by default in Sessions) handles this at
  * runtime for sort-merge joins; explicit salting remains the tool
  * when the skew is known a priori or the join is hash-partitioned by
  * a custom pipeline. One extra column + a `salts`-way explode of the
  * small side — no extra shuffle stages.
  */
object Skew {
  /** Equi-join `big ⋈ small` on `key` with an `nSalts`-way salt.
    *
    * Supported: `inner`, `left`(_outer), `left_semi`, `left_anti` —
    * every type whose output rows come from the big side only, where
    * replicating the small side cannot duplicate output (each big row
    * carries ONE salt, and semi/anti existence checks are unaffected
    * by copies). Rejected: `right`/`full`, which preserve unmatched
    * small-side rows and would emit each of them `nSalts` times as
    * duplicate null-extended rows. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "semi",
        "anti")(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin replicates the small side $nSalts times; " +
        s"'$joinType' would duplicate unmatched small-side rows — " +
        "use inner/left/left_semi/left_anti")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
