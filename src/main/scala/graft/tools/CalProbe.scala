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
    // host_scale Bench now derives (robust to one misbehaving probe)
    val ratios = runs.head.map { case (k, _) =>
      val best = runs.flatMap(_.toMap.get(k)).filter(_ >= 0)
      k -> (if (best.isEmpty) -1.0
            else best.min / graft.Bench.CalRefProbes.getOrElse(k, 1.0))
    }
    println("[calprobe] ratios " +
      ratios.map { case (k, r) => f"$k=$r%.3f" }.mkString(" ") +
      f" host_scale(median)=${graft.Bench.hostScale(runs.head, runs.last)}%.3f")
    spark.stop()
  }
}
