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
    (1 to 3).foreach { i =>
      val c = graft.Bench.calibrate(spark)
      println(s"[calprobe] run$i " +
        c.map { case (k, v) => f"$k=$v%.3f" }.mkString(" ") +
        f" total=${c.map(_._2).sum}%.3f ref=${graft.Bench.CalRef}")
    }
    spark.stop()
  }
}
