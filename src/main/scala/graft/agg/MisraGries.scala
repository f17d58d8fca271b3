package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary (the space-saving/frequent-items
  * sketch family): at most `k` counters regardless of stream length,
  * so the partial-aggregate shuffled from each partition is O(k) — the
  * bounded-state property that makes corpus-wide top-token estimation
  * safe at 100 TB (an exact groupBy shuffles one row per distinct key;
  * this shuffles at most k per partition).
  *
  * Guarantees (classic MG + the mergeable-summaries merge of Agarwal
  * et al., PODS'12):
  *   - underestimate only: est(x) <= true(x)
  *   - bounded error:      true(x) - est(x) <= n / (k+1)
  *   - any x with true(x) > n/(k+1) is present in the summary
  *   - with k >= |distinct keys| the counts are EXACT (no decrement
  *     ever fires) — which is what makes `agg_heavy_hitters`
  *     oracle-checkable against exact DuckDB counts.
  *
  * Reference scope: the frequent-items analytics the reference's
  * windowed top-N jobs compute exactly (hot-item style), re-expressed
  * as a bounded sketch for the cardinalities where exact state no
  * longer fits (SURVEY §2.5 approx-aggregate row).
  */
case class MgAcc(counters: Map[String, Long], n: Long)

class MisraGries(k: Int) extends Aggregator[String, MgAcc, MgAcc] {
  require(k >= 1, "capacity must be >= 1")

  def zero: MgAcc = MgAcc(Map.empty, 0L)

  def reduce(b: MgAcc, x: String): MgAcc = {
    if (x == null) return b // nulls carry no frequency mass; and a null
    // key would be illegal in the output MapType anyway
    val c = b.counters
    c.get(x) match {
      case Some(v) => MgAcc(c.updated(x, v + 1), b.n + 1)
      case None if c.size < k => MgAcc(c.updated(x, 1L), b.n + 1)
      case None =>
        // full and x absent: decrement every counter, drop zeros
        MgAcc(c.collect { case (key, v) if v > 1 => key -> (v - 1) }, b.n + 1)
    }
  }

  def merge(a: MgAcc, b: MgAcc): MgAcc = {
    val sum = b.counters.foldLeft(a.counters) { case (m, (key, v)) =>
      m.updated(key, m.getOrElse(key, 0L) + v)
    }
    if (sum.size <= k) MgAcc(sum, a.n + b.n)
    else {
      // subtract the (k+1)-th largest count from all, keep positives —
      // preserves the n/(k+1) bound under arbitrary merge trees
      val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      MgAcc(sum.collect { case (key, v) if v > d => key -> (v - d) }, a.n + b.n)
    }
  }

  def finish(r: MgAcc): MgAcc = r
  def bufferEncoder: Encoder[MgAcc] = Encoders.product[MgAcc]
  def outputEncoder: Encoder[MgAcc] = Encoders.product[MgAcc]
}
