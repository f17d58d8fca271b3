package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join: result-equivalent to the plain join, while spreading
  * a hot key across salt sub-keys. */
class SkewSpec extends SparkSpec {

  test("salted join == plain join; hot key spreads across salts") {
    val s = spark
    import s.implicits._
    // one pathological key (90% of rows) + a uniform tail
    val big = ((1 to 900).map(i => (42L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong % 7, i.toDouble)))
      .toDF("k", "v")
    val small = Seq((42L, "hot"), (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f"), (0L, "g")).toDF("k", "name")

    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // the hot key's rows really do carry several distinct salts
    val saltsUsed = big.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .filter(col("k") === 42L)
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(saltsUsed >= 4, s"hot key only used $saltsUsed salts")

    // outer flavor: unmatched big-side keys survive exactly once
    val leftJoin = Skew.saltedJoin(big, small, "k", 8, "left")
    assert(leftJoin.count() == big.count())

    // semi/anti are salt-safe (output rows come from the big side
    // only, so small-side replication cannot duplicate them) and must
    // match the plain forms
    val semi = Skew.saltedJoin(big, small, "k", 8, "left_semi")
    assert(semi.count() == big.join(small, Seq("k"), "left_semi").count())
    val anti = Skew.saltedJoin(big, small, "k", 8, "left_anti")
    assert(anti.count() == big.join(small, Seq("k"), "left_anti").count())

    // right/full would duplicate unmatched small-side rows: rejected
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "k", 8, "full")
    }
  }
}
