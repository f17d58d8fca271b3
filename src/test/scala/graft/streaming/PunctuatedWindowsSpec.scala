package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Punctuated watermark windows (PunctuatedWindows.tumbling) replayed
  * against the reference demo's exact event sequence
  * (`WatermarkDemo.scala:170-199`, generator
  * `MyPunctuatedWatermark.scala:18-25`): delay 10 s, tumbling 10 s,
  * one key, events
  *   28, 25, 27, 30, 40, 29   (seconds past 2020-03-24 10:12:00 UTC)
  * Expected per the demo's inline commentary: the 40 s element lifts
  * the watermark to 30 s and fires [20 s, 30 s) with exactly the three
  * elements 28|25|27; the 29 s element arrives after wm = 30 s and is
  * dropped ("迟到太多的数据，flink直接丢弃"); [30 s, 40 s) and
  * [40 s, 50 s) stay open because no later element closes them. */
class PunctuatedWindowsSpec extends SparkSpec {

  private val T0 = 1585015920000L // 2020-03-24 10:12:00 UTC — window-aligned
  private def ev(key: Long, sec: Long, v: Double = 1.0) =
    KeyedEvent(key, ts(T0 + sec * 1000), "e", v)

  private def rows(name: String) = spark.table(name).collect()
    .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
               r.getDouble(3), r.getTimestamp(4).getTime)).toList

  test("reference demo sequence: one mid-stream firing, late drop, open tails") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = PunctuatedWindows.tumbling(in.toDS(), windowMs = 10000L, delayMs = 10000L)
      .writeStream.format("memory").queryName("punct")
      .outputMode(OutputMode.Update()).start()
    try {
      // the whole demo sequence in ONE batch: the firing must happen
      // mid-batch on the 40s element, not at a batch boundary
      in.addData(ev(1, 28, 28), ev(1, 25, 25), ev(1, 27, 27),
                 ev(1, 30, 30), ev(1, 40, 40), ev(1, 29, 29))
      q.processAllAvailable()
      assert(rows("punct") ==
        List((1L, T0 + 20000L, 3L, 28.0 + 25 + 27, T0 + 40000L)),
        s"demo firing wrong: ${rows("punct")}")

      // the 29s element was dropped INSIDE the batch (wm already 30s):
      // a marker at 55s closes [30,40) — sum must NOT contain 29
      in.addData(ev(1, 55, 55))
      q.processAllAvailable()
      assert(rows("punct").last == (1L, T0 + 30000L, 1L, 30.0, T0 + 55000L),
        s"[30,40) firing wrong: ${rows("punct")}")
    } finally q.stop()
  }

  test("per-key watermarks are independent (per-subtask generator model)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = PunctuatedWindows.tumbling(in.toDS(), windowMs = 10000L, delayMs = 0L)
      .writeStream.format("memory").queryName("punct2")
      .outputMode(OutputMode.Update()).start()
    try {
      // key 1 advances to 25s (fires its [0,10)); key 2 only to 5s
      // (its window stays open) — one key's elements must not close
      // another key's windows
      in.addData(ev(1, 3, 3), ev(1, 25, 25), ev(2, 5, 5))
      q.processAllAvailable()
      assert(rows("punct2") == List((1L, T0, 1L, 3.0, T0 + 25000L)),
        s"per-key isolation wrong: ${rows("punct2")}")

      // key 2 catching up fires ITS window, including its buffered 5s
      in.addData(ev(2, 12, 12))
      q.processAllAvailable()
      assert(rows("punct2").last == (2L, T0, 1L, 5.0, T0 + 12000L),
        s"key-2 firing wrong: ${rows("punct2")}")
    } finally q.stop()
  }

  test("state persists across batches; reopened windows don't resurrect") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = PunctuatedWindows.tumbling(in.toDS(), windowMs = 10000L, delayMs = 5000L)
      .writeStream.format("memory").queryName("punct3")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(ev(1, 2, 2), ev(1, 4, 4)) // [0,10): cnt 2, wm = -1s
      q.processAllAvailable()
      assert(rows("punct3").isEmpty)
      in.addData(ev(1, 8, 8), ev(1, 16, 16)) // wm -> 11s: fire [0,10) cnt 3
      q.processAllAvailable()
      assert(rows("punct3") == List((1L, T0, 3L, 14.0, T0 + 16000L)),
        s"cross-batch accumulate wrong: ${rows("punct3")}")
      // an element back inside the FIRED window is late (we <= wm):
      // dropped, no re-firing (allowedLateness 0 in the demo)
      in.addData(ev(1, 9, 9), ev(1, 30, 30))
      q.processAllAvailable()
      assert(rows("punct3").count(_._2 == T0) == 1,
        s"fired window resurrected: ${rows("punct3")}")
    } finally q.stop()
  }
}
