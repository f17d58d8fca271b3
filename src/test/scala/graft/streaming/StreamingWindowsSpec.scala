package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming flavors of the windowed aggregations whose batch forms
  * are oracle-checked (tw_session / tw_cumulate): gap sessions close
  * when the watermark passes, cumulate windows fire early per batch. */
class StreamingWindowsSpec extends SparkSpec {

  test("streaming session window: gap merge + watermark close") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDS().withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
      .select(col("session_window.start").as("s_start"), col("key"),
        col("cnt"), col("sum_v"))
    val q = agg.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two bursts 30 s apart -> two sessions; second batch's high ts
      // moves the watermark past both session ends
      input.addData(
        KeyedEvent(1, ts(1000), "e", 1.0), KeyedEvent(1, ts(5000), "e", 2.0),
        KeyedEvent(1, ts(35000), "e", 4.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(2, ts(120000), "e", 8.0))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      // session 1: events at 1s+5s merged (gap < 10s); session 2: 35s
      assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming cumulate: expanding windows fire early in update mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    // 40 s max window, 10 s step — event at t contributes to every
    // expanded window whose end is past it (same expression as the
    // oracle-checked tw_cumulate, minutes scaled to seconds)
    val ev = input.toDS()
      .withColumn("w_start", window(col("ts"), "40 seconds").getField("start"))
      .withColumn("w_end", explode(sequence(
        date_trunc("second", col("ts")) +
          expr("INTERVAL 10 SECONDS") - // next 10s boundary at or after ts
          expr("make_interval(0, 0, 0, 0, 0, 0, unix_timestamp(ts) % 10)"),
        col("w_start") + expr("INTERVAL 40 SECONDS"),
        expr("INTERVAL 10 SECONDS"))))
    val agg = ev.groupBy("w_start", "w_end")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
    val q = agg.writeStream.format("memory").queryName("cum")
      .outputMode("update").start()
    try {
      input.addData(KeyedEvent(1, ts(5000), "e", 1.0))   // t=5s
      q.processAllAvailable()
      input.addData(KeyedEvent(1, ts(15000), "e", 2.0))  // t=15s
      q.processAllAvailable()
      val rows = spark.table("cum").collect()
        .map(r => (r.getTimestamp(1).getTime / 1000, r.getLong(2),
          r.getDouble(3)))
      // batch 1: t=5s lands in ends 10,20,30,40 with cnt=1
      assert(rows.count { case (_, c, v) => c == 1 && v == 1.0 } >= 4)
      // batch 2 (update): ends 20,30,40 now cover both events
      val updated = rows.filter { case (end, c, v) => c == 2 && v == 3.0 }
      assert(updated.map(_._1).toSet == Set(20L, 30L, 40L))
    } finally q.stop()
  }
}
