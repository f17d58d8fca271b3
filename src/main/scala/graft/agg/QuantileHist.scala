package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile-histogram sketch (the streaming-histogram design
  * of Ben-Haim & Yom-Tov, JMLR 2010): at most `k` (centroid, count)
  * bins per partial, so distributed percentiles cost O(partitions × k)
  * shuffled state instead of a full sort — the bounded-state path for
  * quantiles at 100 TB (an exact `percentile` buffers every value of
  * the group on one reducer).
  *
  * Compression merges the closest adjacent bin pair (weighted mean).
  * Two invariants make it oracle-checkable:
  *   - equal-centroid merges are LOSSLESS (the centroid is kept
  *     verbatim, counts add), so with <= k distinct values the summary
  *     IS the exact value histogram on any partitioning/merge order;
  *   - `finish` interpolates ranks exactly like SQL `percentile` /
  *     `quantile_cont` (h = (n-1)q over the expanded multiset), so the
  *     at-capacity result hash-matches the exact engines bit-for-bit.
  * Under capacity the estimate degrades gracefully (QuantileHistSpec
  * asserts rank-error tolerance, monotonicity, mass conservation).
  */
case class QBin(v: Double, c: Long)
case class QHistAcc(bins: Seq[QBin])

class QuantileHist(k: Int, qs: Seq[Double])
    extends Aggregator[java.lang.Double, QHistAcc, Seq[Double]] {
  // boxed IN: a primitive input schema reads NULL cells as 0.0 — a
  // phantom sample that shifts every quantile; nullable input lets
  // reduce skip them like percentile_cont does
  require(k >= 2, "need at least 2 bins")

  def zero: QHistAcc = QHistAcc(Vector.empty)

  /** merge the adjacent pair with the smallest centroid gap (leftmost
    * on ties — equal centroids merge first and losslessly) */
  private def compress(bins: Vector[QBin]): Vector[QBin] = {
    if (bins.size <= k) bins
    else {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < bins.size - 1) {
        val gap = bins(i + 1).v - bins(i).v
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val a = bins(best); val b = bins(best + 1)
      val merged =
        if (a.v == b.v) QBin(a.v, a.c + b.c) // lossless, keeps exactness
        else QBin((a.v * a.c + b.v * b.c) / (a.c + b.c), a.c + b.c)
      compress(bins.patch(best, Seq(merged), 2))
    }
  }

  def reduce(acc: QHistAcc, xx: java.lang.Double): QHistAcc = {
    if (xx == null) return acc // SQL aggregates skip NULL inputs
    val x: Double = xx
    val bins = acc.bins.toVector
    val idx = bins.indexWhere(_.v >= x)
    val next =
      if (idx >= 0 && bins(idx).v == x)
        bins.updated(idx, QBin(x, bins(idx).c + 1))
      else if (idx < 0) bins :+ QBin(x, 1L)
      else bins.patch(idx, Seq(QBin(x, 1L)), 0)
    QHistAcc(compress(next))
  }

  def merge(a: QHistAcc, b: QHistAcc): QHistAcc = {
    // merge two sorted bin lists, combining equal centroids losslessly
    val out = Vector.newBuilder[QBin]
    var (i, j) = (0, 0)
    val (xs, ys) = (a.bins.toVector, b.bins.toVector)
    while (i < xs.size || j < ys.size) {
      if (j >= ys.size || (i < xs.size && xs(i).v < ys(j).v)) { out += xs(i); i += 1 }
      else if (i >= xs.size || ys(j).v < xs(i).v) { out += ys(j); j += 1 }
      else { out += QBin(xs(i).v, xs(i).c + ys(j).c); i += 1; j += 1 }
    }
    QHistAcc(compress(out.result()))
  }

  /** rank-interpolated quantiles over the bin multiset — identical to
    * SQL percentile/quantile_cont when the histogram is exact */
  def finish(acc: QHistAcc): Seq[Double] = {
    val bins = acc.bins
    // SQL percentile over zero accepted rows is NULL, not NaNs
    if (bins.isEmpty) return null
    val n = bins.map(_.c).sum
    def valueAt(rank: Long): Double = {
      var cum = 0L
      var i = 0
      while (i < bins.size) {
        cum += bins(i).c
        if (rank < cum) return bins(i).v
        i += 1
      }
      bins.last.v
    }
    qs.map { q =>
      val h = (n - 1) * q
      val lo = math.floor(h).toLong
      val (vl, vh) = (valueAt(lo), valueAt(lo + 1))
      vl + (h - lo) * (vh - vl)
    }
  }

  def bufferEncoder: Encoder[QHistAcc] = Encoders.product[QHistAcc]
  def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
        scala.reflect.classTag[Seq[Double]],
        org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveDoubleEncoder,
        containsNull = false, lenientSerialization = false))
}
