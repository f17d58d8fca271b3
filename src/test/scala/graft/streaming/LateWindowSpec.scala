package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Flink-style allowedLateness window re-firing (LateWindow.tumbling):
  * one on-time firing when the (emulated) Flink watermark passes the
  * window end, an immediate re-firing per allowed-late batch, silent
  * purge once lateness is exhausted, and upstream dropping of
  * too-late rows (the reference's side-output channel).
  *
  * Window 10s, D = 5s, L = 10s -> Spark watermark delay 15s;
  * flinkWM = maxEvent - 5s, purge when sparkWM (= maxEvent - 15s)
  * passes the window end. */
class LateWindowSpec extends SparkSpec {

  /** All event times sit one day past the epoch: Spark's initial
    * watermark is 0 (not -inf like Flink's), so epoch-adjacent windows
    * whose end <= L would look already-past-on-time before any data.
    * Real event times are never near the epoch; offsets in comments
    * below are relative to B. */
  private val B = 86400000L

  test("on-time firing, late re-fire, purge, side-output drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = LateWindow.tumbling(in.toDS(),
        windowMs = 10000L, delayMs = 5000L, latenessMs = 10000L)
      .writeStream.format("memory").queryName("latewin")
      .outputMode(OutputMode.Update()).start()
    def rows() = spark.table("latewin").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                 r.getDouble(3), r.getInt(4), r.getBoolean(5))).toList
    def win0() = rows().filter(_._2 == B).sortBy(_._5)
    try {
      // window [0,10s): two on-time events; watermark still at origin
      // -> nothing fires yet (flinkWM < window end)
      in.addData(KeyedEvent(1L, ts(B + 1000L), "e", 10),
                 KeyedEvent(1L, ts(B + 2000L), "e", 20))
      q.processAllAvailable()
      assert(rows().isEmpty, s"fired before watermark passed end: ${rows()}")

      // event at 16s -> sparkWM = 1s, flinkWM = 11s >= 10s: the
      // on-time timer (at we - L = 0) fires window [0,10s) once
      in.addData(KeyedEvent(1L, ts(B + 16000L), "e", 1))
      q.processAllAvailable()
      assert(win0() == List((1L, B, 2L, 30.0, 1, false)),
        s"on-time firing wrong: ${win0()}")

      // allowed-late arrival at 3s (> sparkWM 1s, window already
      // fired): immediate re-firing with updated aggregate
      in.addData(KeyedEvent(1L, ts(B + 3000L), "e", 5))
      q.processAllAvailable()
      assert(win0() == List((1L, B, 2L, 30.0, 1, false),
                            (1L, B, 3L, 35.0, 2, true)),
        s"late re-firing wrong: ${win0()}")

      // too-late arrival at 0.5s (< sparkWM 1s, i.e. flinkWM past
      // end + L): dropped upstream = the reference's side output
      val before = rows()
      in.addData(KeyedEvent(1L, ts(B + 500L), "e", 99))
      q.processAllAvailable()
      assert(rows() == before, s"side-output row leaked into window: ${rows()}")

      // advance sparkWM to 11s (event at 26s): window [0,10s) purges
      // SILENTLY (no third firing); window [10,20s) hits ITS on-time
      // point (flinkWM = 21s >= 20s) and fires with the 16s event
      in.addData(KeyedEvent(1L, ts(B + 26000L), "e", 2))
      q.processAllAvailable()
      assert(win0().size == 2, s"purge must not re-fire: ${win0()}")
      val win10 = rows().filter(_._2 == B + 10000L)
      assert(win10 == List((1L, B + 10000L, 1L, 1.0, 1, false)),
        s"second window on-time firing wrong: $win10")

      // after purge, a would-have-been-late row for [0,10s) at 4s is
      // below sparkWM -> dropped; the purged window stays at 2 firings
      in.addData(KeyedEvent(1L, ts(B + 4000L), "e", 7))
      q.processAllAvailable()
      assert(win0().size == 2, s"row revived a purged window: ${win0()}")
    } finally q.stop()
  }

  test("two late elements in ONE batch re-fire once EACH (per-element trigger)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = LateWindow.tumbling(in.toDS(),
        windowMs = 10000L, delayMs = 5000L, latenessMs = 10000L)
      .writeStream.format("memory").queryName("latewin_perel")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(KeyedEvent(3L, ts(B + 1000L), "e", 10))
      q.processAllAvailable()
      in.addData(KeyedEvent(3L, ts(B + 16000L), "e", 1)) // on-time fire [0,10s)
      q.processAllAvailable()
      // one batch, two allowed-late rows -> the reference fires per
      // element: (2, 14.0, firing 2) then (3, 16.0, firing 3) in
      // event-time order — a coalescing emulation would emit only the
      // second
      in.addData(KeyedEvent(3L, ts(B + 4000L), "e", 4),
                 KeyedEvent(3L, ts(B + 5000L), "e", 2))
      q.processAllAvailable()
      val win0 = spark.table("latewin_perel").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                   r.getDouble(3), r.getInt(4), r.getBoolean(5)))
        .filter(_._2 == B).toList.sortBy(_._5)
      assert(win0 == List((3L, B, 1L, 10.0, 1, false),
                          (3L, B, 2L, 14.0, 2, true),
                          (3L, B, 3L, 16.0, 3, true)),
        s"per-element late re-firing wrong: $win0")
    } finally q.stop()
  }

  test("watermark jumping the whole lateness horizon still fires exactly once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = LateWindow.tumbling(in.toDS(),
        windowMs = 10000L, delayMs = 5000L, latenessMs = 10000L)
      .writeStream.format("memory").queryName("latewin_jump")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(KeyedEvent(2L, ts(B + 1000L), "e", 10))
      q.processAllAvailable()
      // jump maxEvent to 60s: sparkWM = 45s >= we = 10s in one advance
      in.addData(KeyedEvent(2L, ts(B + 60000L), "e", 1))
      q.processAllAvailable()
      in.addData(KeyedEvent(2L, ts(B + 61000L), "e", 1)) // extra batch for timers
      q.processAllAvailable()
      val win0 = spark.table("latewin_jump").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                   r.getInt(4), r.getBoolean(5)))
        .filter(_._2 == B).toList
      assert(win0 == List((2L, B, 1L, 1, false)),
        s"jumped window must fire exactly once: $win0")
    } finally q.stop()
  }
}
