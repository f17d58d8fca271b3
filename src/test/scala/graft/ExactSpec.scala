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

  test("Exact.q6 is exactly the three scalar IEEE ops (no fusion/reordering)") {
    // The cross-engine contract is NOT "lands on a decimal grid" —
    // x*1e6 and /1e6 each round, so round-trips can sit one ulp off an
    // integer. The contract is: q6 performs exactly
    // floor(x * 1e6) / 1e6 as three sequential IEEE ops, so any engine
    // doing the same three ops on the same bits produces the same
    // bits. Verify the codegen path against a scalar reference (a
    // fused-multiply-add or constant-folding deviation would differ on
    // some of these inputs).
    val s = spark
    import s.implicits._
    def ref(x: Double): Double = math.floor(x * 1000000.0) / 1000000.0
    val xs = doubles(11, 2000) ++
      Seq(-1.0000005, 1.0000005, -1e-7, 1e-7, 0.0, 123.4567891234)
    val rows = xs.toDF("x")
      .select(col("x"), Exact.q6(col("x")).as("q")).collect()
    rows.foreach { r =>
      val (x, q) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToRawLongBits(q) ==
        java.lang.Double.doubleToRawLongBits(ref(x)),
        s"q6($x)=$q != scalar reference ${ref(x)}")
      // within one grid step of x (the multiply can round x·1e6 up to
      // the next integer, so q may exceed x by an ulp — distance, not
      // direction, is the stable claim)
      assert(math.abs(x - q) < 1e-6 + 2 * math.ulp(math.abs(x).max(1.0)),
        s"q6($x)=$q too far from x")
    }
  }
}
