package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted average as a typed Aggregator — the reference's canonical
  * UDAF example (TabApiTest.scala WeightedAvg; tutorial TabFunction):
  * accumulate adds (v·w, w), merge sums partials, getValue divides.
  *
  * Sums are kept in BigDecimal (exact, order-independent) so the
  * distributed partial/final merge order cannot perturb the result —
  * the same discipline as core.Exact, which makes the query flavor
  * (agg_weighted_avg) hash-match the DuckDB oracle. */
case class WAvgAcc(sum: BigDecimal, wsum: BigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WAvgAcc, Double] {
  private val Zero = BigDecimal(0).setScale(4)
  def zero: WAvgAcc = WAvgAcc(Zero, Zero)
  def reduce(b: WAvgAcc, a: (Double, Double)): WAvgAcc =
    WAvgAcc(b.sum + BigDecimal(a._1 * a._2).setScale(4, BigDecimal.RoundingMode.HALF_UP),
      b.wsum + BigDecimal(a._2).setScale(4, BigDecimal.RoundingMode.HALF_UP))
  def merge(a: WAvgAcc, b: WAvgAcc): WAvgAcc =
    WAvgAcc(a.sum + b.sum, a.wsum + b.wsum)
  def finish(r: WAvgAcc): Double =
    if (r.wsum.signum == 0) Double.NaN else (r.sum.toDouble / r.wsum.toDouble)
  def bufferEncoder: Encoder[WAvgAcc] = Encoders.product[WAvgAcc]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
