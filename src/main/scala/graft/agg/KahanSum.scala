package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Compensated (Kahan–Babuška/Neumaier) summation as a typed
  * `Aggregator` — the 100 TB-scale path for float sums and means.
  *
  * The order-exact alternatives used by the oracle-checked queries
  * (sorted sequential folds in `emb_centroid` / `emb_kmeans`) buffer
  * the whole group per key, which is fine at test scale but O(group)
  * memory at 100 TB. This aggregator is O(1) state, plans as a normal
  * partial/final aggregate (map-side combine in each partition, one
  * merge per partition pair), and its result is within ~1 ulp of the
  * exact sum REGARDLESS of partition order — so while it is not
  * bit-reproducible across different partitionings, it is far more
  * accurate than naive `sum(double)` whose error grows with both
  * group size and shuffle layout.
  *
  * Mirrors the reference's accumulate/merge UDAF contract
  * (TabApiTest.scala:1453-1484): accumulate = reduce, merge = merge,
  * getValue = finish.
  */
case class KahanAcc(s: Double, c: Double, n: Long)

/* IN is boxed: a primitive Double input schema is non-nullable, and
 * Spark's input projection silently reads NULL cells as 0.0 through
 * it — corrupting the sum instead of skipping the row as every SQL
 * aggregate does. Boxed input keeps the schema nullable so reduce
 * can skip. */
object KahanSum extends Aggregator[java.lang.Double, KahanAcc, java.lang.Double] {
  def zero: KahanAcc = KahanAcc(0.0, 0.0, 0L)

  /** Neumaier update: the compensation also captures the case where
    * the incoming term is larger than the running sum. */
  private def add(s: Double, c: Double, v: Double): (Double, Double) = {
    val t = s + v
    val comp =
      if (math.abs(s) >= math.abs(v)) (s - t) + v
      else (v - t) + s
    (t, c + comp)
  }

  def reduce(b: KahanAcc, a: java.lang.Double): KahanAcc = {
    if (a == null) return b // SQL aggregates skip NULL inputs
    val (s, c) = add(b.s, b.c, a)
    KahanAcc(s, c, b.n + 1)
  }

  /** Merging two compensated partials: sum the sums with one more
    * compensated step, then combine both residual compensations. */
  def merge(a: KahanAcc, b: KahanAcc): KahanAcc = {
    val (s, c) = add(a.s, a.c + b.c, b.s)
    KahanAcc(s, c, a.n + b.n)
  }

  /** SQL sum over zero accepted rows is NULL, not 0.0. */
  def finish(r: KahanAcc): java.lang.Double =
    if (r.n == 0) null else r.s + r.c
  def bufferEncoder: Encoder[KahanAcc] = Encoders.product[KahanAcc]
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

/** Compensated mean on top of the same accumulator. */
object KahanMean extends Aggregator[java.lang.Double, KahanAcc, java.lang.Double] {
  def zero: KahanAcc = KahanSum.zero
  def reduce(b: KahanAcc, a: java.lang.Double): KahanAcc = KahanSum.reduce(b, a)
  def merge(a: KahanAcc, b: KahanAcc): KahanAcc = KahanSum.merge(a, b)
  /** SQL avg over zero accepted rows is NULL, not NaN. */
  def finish(r: KahanAcc): java.lang.Double =
    if (r.n == 0) null else (r.s + r.c) / r.n
  def bufferEncoder: Encoder[KahanAcc] = Encoders.product[KahanAcc]
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
