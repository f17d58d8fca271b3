package graft.tools

/** Standalone runner for Bench's host-calibration micro-suite: three
  * back-to-back blocks so a reader can see the warm steady state and
  * judge host drift without a full bench run. Used to pin
  * `Bench.CalRef` (round 11) and to re-derive it if the container
  * ever changes.
  */
object CalProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.build("cal-probe")
    graft.Bench.warmJvm(spark)
    val runs = (1 to 3).map { i =>
      val c = graft.Bench.calibrate(spark)
      println(s"[calprobe] run$i " +
        c.map { case (k, v) => f"$k=$v%.3f" }.mkString(" ") +
        f" total=${c.map(_._2).sum}%.3f")
      c
    }
    // per-probe ratios vs the committed calm references + the median
    // host_scale Bench now derives (robust to one misbehaving probe).
    // The displayed median is computed FROM those same all-runs-min
    // ratios — feeding hostScale(head, last) here ignored run 2, so
    // the two diagnostics on one line could disagree (ADVICE r12).
    val ratios = runs.head.map { case (k, _) =>
      val best = runs.flatMap(_.toMap.get(k)).filter(_ >= 0)
      k -> (if (best.isEmpty) -1.0
            else best.min / graft.Bench.CalRefProbes.getOrElse(k, 1.0))
    }
    val rs = ratios.collect {
      case (k, r) if r > 0 && graft.Bench.CalRefProbes.contains(k) => r
    }.sorted
    val median =
      if (rs.isEmpty) -1.0
      else if (rs.size % 2 == 1) rs(rs.size / 2)
      else (rs(rs.size / 2 - 1) + rs(rs.size / 2)) / 2.0
    println("[calprobe] ratios " +
      ratios.map { case (k, r) => f"$k=$r%.3f" }.mkString(" ") +
      f" host_scale(median)=$median%.3f")
    spark.stop()
  }
}
