package graft.tools

import graft.SparkEntry
import graft.core.Sessions

/** Two-SF scaling readout: times every registered query at a small and
  * a large scale factor and reports the time ratio against the data
  * ratio, so SUPERLINEAR queries surface numerically instead of by
  * plan inspection. A query whose work is linear in the data shows a
  * ratio at or (usually, because fixed per-query overhead dominates at
  * small SF) well below the data ratio; a quadratic pair-join shows
  * ~dataRatio², which no local wall-clock at ONE scale factor reveals.
  *
  * Run: sbt "runMain graft.tools.ScalingProbe [smallDir largeDir]"
  *   (defaults /root/testdata/sf0.01 vs sf0.1, data ratio 10×)
  *
  * Output: scaling.json (full per-query map with provenance) + a
  * flagged-query table on stdout. Flag threshold: ratio > 2× the data
  * ratio AND large-SF time > 0.5 s — sub-second queries are overhead-
  * dominated and their ratios are noise, and ratios only slightly
  * above the data ratio are cache/spill texture, not complexity.
  * Exits 1 when any query is flagged (promoted to a GATE in round 10;
  * ScalingSpec additionally rot-checks the committed artifact against
  * the live catalog and proves the detector fires on a deliberately
  * quadratic probe).
  */
object ScalingProbe {

  /** The superlinearity flag, factored out so ScalingSpec gates the
    * SAME predicate the artifact run uses (no drift between the spec's
    * idea of "flagged" and the probe's). */
  def isFlagged(ratio: Double, largeSec: Double, dataRatio: Double): Boolean =
    ratio > 2 * dataRatio && largeSec > 0.5

  /** Warm-then-time one plan with the probe's discipline (warm run,
    * GC outside the window, count() action). -1.0 on failure. */
  def timeOnce(mk: => org.apache.spark.sql.DataFrame): Double = {
    try mk.count() catch { case _: Throwable => return -1.0 } // warm
    System.gc()
    val t0 = System.nanoTime()
    try { mk.count(); (System.nanoTime() - t0) / 1e9 }
    catch { case _: Throwable => -1.0 }
  }
  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val large = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // the data ratio IS the flag threshold's denominator — a dir name
    // the sf-regex can't parse must be a loud error, not a silent 1.0
    // that mass-flags every linear query as superlinear
    val dataRatio = (graft.Bench.sfOf(small), graft.Bench.sfOf(large)) match {
      case (Some(s), Some(l)) => l / s
      case _ => sys.error(
        s"cannot parse scale factors from '$small' / '$large' — dirs must contain sf<N>")
    }
    val spark = Sessions.build("graft-scaling")
    graft.Bench.warmJvm(spark)

    def time(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
             d: String): Double = timeOnce(fn(spark, d))

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val ts = time(fn, small)
      val tl = time(fn, large)
      val ratio = if (ts > 0 && tl > 0) tl / ts else -1.0
      (name, ts, tl, ratio)
    }
    def f(v: Double) = graft.Bench.fmt3(v)
    val json = rows.map { case (n, ts, tl, r) =>
      s""""$n":{"small":${f(ts)},"large":${f(tl)},"ratio":${f(r)}}"""
    }.mkString("{", ",", s"""},"data_ratio":$dataRatio,${graft.core.Provenance.jsonFields}}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("scaling.json"),
      s"""{"queries":$json""")

    val flagged = rows.filter { case (_, _, tl, r) =>
      isFlagged(r, tl, dataRatio) }
    println(f"[scaling] data ratio ${dataRatio}%.0fx; flag = time ratio > ${2 * dataRatio}%.0fx and large > 0.5s")
    rows.sortBy(-_._4).take(15).foreach { case (n, ts, tl, r) =>
      val mark = if (flagged.exists(_._1 == n)) "  << SUPERLINEAR" else ""
      println(f"[scaling] $n%-22s ${ts}%7.3fs -> ${tl}%7.3fs  ratio ${r}%6.2fx$mark")
    }
    println(s"[scaling] flagged: ${flagged.size}/${rows.size}")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}
