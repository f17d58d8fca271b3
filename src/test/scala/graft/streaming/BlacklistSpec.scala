package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Daily click-cap blacklist (StatefulOps.dailyCapBlacklist — the
  * reference's FilterBlackListUser): clicks pass until the cap, the
  * first excess click emits exactly one warning per day, and the
  * event-time day boundary resets both counter and warning flag. */
class BlacklistSpec extends SparkSpec {

  test("cap passes, warns once, resets at the day boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val day = 86400000L
    val in = MemoryStream[KeyedEvent]
    // 2-day allowed lateness so a previous-day event can arrive ABOVE
    // the watermark (not dropped) after the state has advanced a day —
    // the backwards-reset regression case below
    val q = StatefulOps.dailyCapBlacklist(
        in.toDS().withWatermark("ts", "2 days"), cap = 2, dayMs = day)
      .writeStream.format("memory").queryName("blk")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("blk").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
      .sortBy(x => (x._1, x._2)).toList
    try {
      // day 0: clicks at 1s,2s pass; 3s trips the warning; 4s swallowed
      in.addData(
        KeyedEvent(7L, ts(1000L), "click", 1),
        KeyedEvent(7L, ts(2000L), "click", 1),
        KeyedEvent(7L, ts(3000L), "click", 1),
        KeyedEvent(7L, ts(4000L), "click", 1),
        KeyedEvent(8L, ts(1500L), "click", 1)) // other key: under cap
      q.processAllAvailable()
      assert(rows() == List(
        (7L, 1000L, "click"), (7L, 2000L, "click"), (7L, 3000L, "blacklist"),
        (8L, 1500L, "click")), s"day-0 emission wrong: ${rows()}")
      // next day: counter and warning flag reset — clicks pass again,
      // and a fresh violation warns again (once)
      in.addData(
        KeyedEvent(7L, ts(day + 1000L), "click", 1),
        KeyedEvent(7L, ts(day + 2000L), "click", 1),
        KeyedEvent(7L, ts(day + 3000L), "click", 1),
        KeyedEvent(7L, ts(day + 4000L), "click", 1))
      q.processAllAvailable()
      val day1 = rows().filter(_._2 >= day)
      assert(day1 == List(
        (7L, day + 1000L, "click"), (7L, day + 2000L, "click"),
        (7L, day + 3000L, "blacklist")), s"day-1 reset wrong: $day1")
      // bounded-late event from the already-closed day 0: must NOT wipe
      // day 1's count/warning state (and is itself dropped — its own
      // day's count is gone, so passing it could exceed day 0's cap)
      val before = rows()
      in.addData(KeyedEvent(7L, ts(5000L), "click", 1))
      q.processAllAvailable()
      assert(rows() == before, s"late day-0 event leaked: ${rows()}")
      // day 1 is still capped + warned: another click stays swallowed
      in.addData(KeyedEvent(7L, ts(day + 5000L), "click", 1))
      q.processAllAvailable()
      assert(rows() == before,
        s"day-1 state was reset by the late event: ${rows()}")
    } finally q.stop()
  }
}
