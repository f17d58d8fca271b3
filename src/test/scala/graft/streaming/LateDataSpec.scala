package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Late-data handling (WatermarkDemo.scala:207-300): Spark's BUILT-IN
  * stateful operators drop late rows with accounting only — this spec
  * pins that baseline behavior (numRowsDroppedByWatermark). The
  * engine's per-row answer is LateRouter (LateRouterSpec): tag rows
  * against the watermark BEFORE the aggregate so the late ones are
  * routable instead of lost. */
class LateDataSpec extends SparkSpec {

  test("rows later than the watermark are dropped AND counted in progress") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDS()
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("update").start()
    try {
      // batch 1: event at t=100s -> watermark advances to ~99s
      input.addData(KeyedEvent(1L, ts(100000L), "a", 1.0))
      q.processAllAvailable()
      // batch 2: an event far BEFORE the watermark -> dropped
      input.addData(KeyedEvent(1L, ts(10000L), "a", 1.0))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark))
        .sum
      assert(dropped >= 1, s"expected dropped-late count, got progress: " +
        q.recentProgress.map(_.stateOperators.toSeq).toSeq)
      // and the late row did not resurrect the old window
      val oldWindow = spark.table("late")
        .filter(col("window.start") === ts(10000L)).collect()
      assert(oldWindow.isEmpty)
    } finally q.stop()
  }

  test("allowedLateness approximation: update mode re-fires a window for " +
    "late-but-allowed rows") {
    // Flink: a window fires at watermark >= end, then RE-fires for each
    // late element until watermark > end + allowedLateness
    // (WatermarkDemo.scala:207-300). Spark approximation (SURVEY §1.4):
    // fold the lateness into the watermark delay and run update mode —
    // the window's state stays open for the combined delay and every
    // late-but-allowed row re-emits the updated aggregate. This spec
    // pins the re-firing behavior the approximation promises.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDS()
      .withWatermark("ts", "5 seconds") // 1s disorder + 4s allowedLateness
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("refire")
      .outputMode("update").start()
    try {
      // window [90,100) fires with cnt=1; watermark -> 95s
      input.addData(KeyedEvent(1L, ts(91000L), "a", 1.0),
        KeyedEvent(1L, ts(100000L), "b", 1.0))
      q.processAllAvailable()
      // t=96s is LATE (window [90,100) already fired) but allowed
      // (96 >= watermark 95) -> the window re-fires with cnt=2
      input.addData(KeyedEvent(1L, ts(96000L), "late-allowed", 1.0))
      q.processAllAvailable()
      val fires = spark.table("refire")
        .filter(col("window.start") === ts(90000L))
        .select("cnt").collect().map(_.getLong(0)).sorted.toSeq
      assert(fires === Seq(1L, 2L),
        s"expected initial fire + late re-fire, got $fires")
    } finally q.stop()
  }
}
