package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom UDAF mirroring the reference's `maxAndMin` AggregateFunction
  * (TabApiTest.scala:1453-1484; TabFunction.scala:30-70): one pass,
  * emits both extrema. Implemented as a typed `Aggregator` so Spark
  * plans it as a regular partial/final aggregate — map-side combine
  * included, no buffering of the group.
  */
case class MaxMinAcc(mx: Double, mn: Double, n: Long)

/** Output with nullable extrema: a group whose every input is NULL has
  * NO extremum — SQL max/min read NULL there, never the ±Infinity
  * sentinels the accumulator starts from. */
case class MaxMinOut(mx: Option[Double], mn: Option[Double], n: Long)

/* Boxed IN: with a primitive input schema Spark reads NULL cells as
 * 0.0 (a phantom extremum); nullable input lets reduce skip them like
 * SQL max/min do. */
object MaxMin extends Aggregator[java.lang.Double, MaxMinAcc, MaxMinOut] {
  /* Extrema use Spark SQL's total ordering (NaN greatest, above +Inf)
   * via java.lang.Double.compare — math.min(x, NaN) reads NaN and
   * would permanently poison the minimum, whereas SQL min over
   * {1.0, NaN} is 1.0. Sentinels under that ordering: smallest value
   * (-Inf) for max, LARGEST value (NaN) for min — so a NaN-only group
   * reads min = NaN exactly like Spark's built-in min. */
  /* Zero handling (ADVICE r12): Spark's SQLOrderingUtil treats ±0.0 as
   * EQUAL while Double.compare orders -0.0 < 0.0, and the built-in
   * Max/Min are incumbent-wins — order-dependent on mixed-zero groups
   * but bit-exactly -0.0 on an all-(-0.0) group. Normalizing zeros at
   * the door (the old fix) broke the latter case. Instead the raw
   * value stays in the accumulator and MIXED-zero ties unify to +0.0
   * inside gt/lt: primitive == is true exactly for equal values
   * including -0.0 == 0.0 (and never for NaN), so an all-(-0.0)
   * group keeps -0.0 like the built-ins while a mixed group reads the
   * deterministic +0.0 for both extrema — bit-order-independent, so
   * merge stays commutative/associative (PropertySpec's law). */
  private def tie(x: Double, y: Double): Double =
    if (java.lang.Double.doubleToRawLongBits(x) !=
        java.lang.Double.doubleToRawLongBits(y)) 0.0
    else x
  private def gt(x: Double, y: Double): Double =
    if (x == y) tie(x, y)
    else if (java.lang.Double.compare(x, y) >= 0) x else y
  private def lt(x: Double, y: Double): Double =
    if (x == y) tie(x, y)
    else if (java.lang.Double.compare(x, y) <= 0) x else y
  def zero: MaxMinAcc = MaxMinAcc(Double.NegativeInfinity, Double.NaN, 0L)
  def reduce(b: MaxMinAcc, a: java.lang.Double): MaxMinAcc =
    if (a == null) b // SQL aggregates skip NULL inputs
    else {
      // raw value in; zero unification happens on tie inside gt/lt
      val v = a.doubleValue()
      MaxMinAcc(gt(b.mx, v), lt(b.mn, v), b.n + 1)
    }
  def merge(a: MaxMinAcc, b: MaxMinAcc): MaxMinAcc =
    MaxMinAcc(gt(a.mx, b.mx), lt(a.mn, b.mn), a.n + b.n)
  def finish(r: MaxMinAcc): MaxMinOut =
    if (r.n == 0) MaxMinOut(None, None, 0L)
    else MaxMinOut(Some(r.mx), Some(r.mn), r.n)
  def bufferEncoder: Encoder[MaxMinAcc] = Encoders.product[MaxMinAcc]
  def outputEncoder: Encoder[MaxMinOut] = Encoders.product[MaxMinOut]
}
