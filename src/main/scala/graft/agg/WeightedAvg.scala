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
case class WAvgAcc(sum: BigDecimal, wsum: BigDecimal,
                   dsum: Double, dwsum: Double, bad: Boolean)

/* Boxed IN fields: with a primitive tuple schema Spark reads NULL
 * cells as 0.0 — a phantom (0·w, w) contribution that silently drags
 * the average. Nullable fields let reduce skip rows with a NULL value
 * or weight, as SQL's multi-argument aggregates (corr, covar) do. */
object WeightedAvg extends Aggregator[(java.lang.Double, java.lang.Double), WAvgAcc, java.lang.Double] {
  private val Zero = BigDecimal(0).setScale(4)
  def zero: WAvgAcc = WAvgAcc(Zero, Zero, 0.0, 0.0, bad = false)
  def reduce(b: WAvgAcc, a: (java.lang.Double, java.lang.Double)): WAvgAcc = {
    if (a._1 == null || a._2 == null) return b // SQL: skip NULL rows
    // A NaN/Inf input has no exact decimal representation
    // (BigDecimal(NaN) throws). The IEEE shadow sums carry the group
    // instead, so the statistic degrades to the NaN/Inf a plain
    // double aggregation would give — never an exception.
    val vw = a._1 * a._2
    val w: Double = a._2
    if (java.lang.Double.isFinite(vw) && java.lang.Double.isFinite(w))
      WAvgAcc(b.sum + BigDecimal(vw).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        b.wsum + BigDecimal(a._2).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        b.dsum + vw, b.dwsum + a._2, b.bad)
    else WAvgAcc(b.sum, b.wsum, b.dsum + vw, b.dwsum + a._2, bad = true)
  }
  def merge(a: WAvgAcc, b: WAvgAcc): WAvgAcc =
    WAvgAcc(a.sum + b.sum, a.wsum + b.wsum,
      a.dsum + b.dsum, a.dwsum + b.dwsum, a.bad || b.bad)
  /** Zero accepted weight on the exact path — no usable rows, or
    * weights summing to exactly zero — is an undefined statistic:
    * SQL's sum(v·w)/sum(w) reads NULL there (NULL/NULL or the house
    * NULLIF-on-denominator convention), never NaN. The non-finite
    * (`bad`) path keeps IEEE semantics: the group already contains a
    * NaN/Inf and the double division reports exactly that. */
  def finish(r: WAvgAcc): java.lang.Double =
    if (r.bad) r.dsum / r.dwsum
    else if (r.wsum.signum == 0) null
    else (r.sum.toDouble / r.wsum.toDouble)
  def bufferEncoder: Encoder[WAvgAcc] = Encoders.product[WAvgAcc]
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
