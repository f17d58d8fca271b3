package graft

import org.apache.spark.sql.functions._

/** Compensated-sum Aggregator: accuracy vs naive double sum, and
  * partial/final planning through udaf() registration. */
class KahanSumSpec extends SparkSpec {

  test("Kahan recovers the small term a naive double sum loses") {
    val s = spark
    import s.implicits._
    val df = Seq(1e16, 1.0, -1e16).toDF("v").repartition(3)
    val ksum = udaf(graft.agg.KahanSum)
    val k = df.agg(ksum(col("v"))).head.getDouble(0)
    assert(k == 1.0)
  }

  test("distributed Kahan sum stays within ulps of the exact sum") {
    val s = spark
    import s.implicits._
    // adversarial magnitudes: big terms bury the small ones' mass
    val xs = (0 until 20000).map { i =>
      if (i % 2 == 0) 1e12 + i else 1e-6 * (i % 997)
    }
    val exact = xs.map(BigDecimal(_)).sum.toDouble
    val df = xs.toDF("v").repartition(17)
    val ksum = udaf(graft.agg.KahanSum)
    val kahan = df.agg(ksum(col("v")).as("k")).head.getDouble(0)
    val naive = df.agg(sum(col("v"))).head.getDouble(0)
    val kahanErr = math.abs(kahan - exact)
    val naiveErr = math.abs(naive - exact)
    assert(kahanErr <= math.ulp(exact) * 4,
      s"kahan off by $kahanErr (> 4 ulp)")
    // the whole point: naive double sum drifts, Kahan does not
    assert(kahanErr < naiveErr || naiveErr == 0.0)
  }

  test("Kahan result is stable across partition layouts; mean handles empty") {
    val s = spark
    import s.implicits._
    val xs = (1 to 9999).map(i => math.pow(-1, i) * 1e9 / i)
    val ksum = udaf(graft.agg.KahanSum)
    def run(parts: Int): Double =
      xs.toDF("v").repartition(parts)
        .agg(ksum(col("v"))).head.getDouble(0)
    val a = run(2)
    val b = run(31)
    assert(math.abs(a - b) <= math.ulp(a) * 4)
    val kmean = udaf(graft.agg.KahanMean)
    val m = xs.toDF("v").agg(kmean(col("v"))).head.getDouble(0)
    val exactMean = xs.map(BigDecimal(_)).sum.toDouble / xs.size
    assert(math.abs(m - exactMean) <= math.abs(exactMean) * 1e-12)
  }
}
