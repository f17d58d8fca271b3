package graft

import org.apache.spark.sql.functions._
import graft.core.Exact

/** End-to-end order-independence of the Exact aggregation layer: the
  * same values summed under different partitionings and orders must be
  * BIT-identical doubles — this is the property the whole cross-engine
  * hash-match strategy stands on (a plain sum(double) fails it).
  */
class ExactSpec extends SparkSpec {

  private def doubles(seed: Int, n: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((r.nextDouble() - 0.5) * r.nextInt(10000))
  }

  test("Exact.dsum and fsum are bit-identical across partitionings and orders") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 3) {
      val xs = doubles(seed, 5000)
      val layouts = Seq(
        xs.toDF("x").repartition(1),
        xs.toDF("x").repartition(13),
        scala.util.Random.shuffle(xs).toDF("x").repartition(7),
        xs.sorted.toDF("x").repartition(4))
      def bits(c: org.apache.spark.sql.Column): Seq[Long] = layouts.map(df =>
        java.lang.Double.doubleToRawLongBits(
          df.agg(c.as("v")).head().getDouble(0)))
      assert(bits(Exact.dsum(col("x"))).distinct.size == 1,
        s"dsum drifted across layouts (seed=$seed)")
      assert(bits(Exact.fsum(col("x"))).distinct.size == 1,
        s"fsum drifted across layouts (seed=$seed)")
    }
  }

  test("grouped fsum is order-independent per group") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(7)
    val rows = Seq.tabulate(4000)(i => (i % 17, (r.nextDouble() - 0.5) * 1e6))
    val a = rows.toDF("k", "x").repartition(3)
      .groupBy("k").agg(Exact.fsum(col("x")).as("v"))
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    val b = scala.util.Random.shuffle(rows).toDF("k", "x").repartition(11)
      .groupBy("k").agg(Exact.fsum(col("x")).as("v"))
      .collect().map(row => row.getInt(0) -> row.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToRawLongBits(v) ==
        java.lang.Double.doubleToRawLongBits(b(k)), s"group $k drifted")
    }
  }
}
