package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class View(ts: Timestamp, item: String)

/** End-to-end port of the hot-items app (HotItems.scala:176-201,
  * TopNHotItems.scala:15-52): sliding-window counts + per-window
  * top-N, emitted once per closed window. */
class HotItemsSpec extends SparkSpec {

  test("per closed window, top-3 items by count, ranked deterministically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[View]
    val base = 1700000000000L - (1700000000000L % 60000)
    // window [base, base+60s): a:4 b:3 c:2 d:1
    def burst(item: String, k: Int, off: Long) =
      (0 until k).map(i => View(ts(base + off + i * 1000L), item))
    input.addData(burst("a", 4, 0) ++ burst("b", 3, 10000) ++
      burst("c", 2, 20000) ++ burst("d", 1, 30000))
    // flush event far past the window to close it
    input.addData(View(ts(base + 300000L), "zz"))

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Int)]
    val q = StreamPipelines.hotItemsTopN(
      input.toDF(), "ts", "item", "60 seconds", "60 seconds", 3, "5 seconds") {
      ranked =>
        results ++= ranked.collect().map(r =>
          (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getInt(3)))
    }.start()
    try {
      q.processAllAvailable()
      val w1 = results.filter(_._1 == base + 60000L).sortBy(_._4)
      assert(w1.map(r => (r._2, r._3, r._4)).toSeq ==
        Seq(("a", 4L, 1), ("b", 3L, 2), ("c", 2L, 3)), s"got $results")
    } finally q.stop()
  }

  test("streaming session window groups by gap per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    input.addData(
      KeyedEvent(1L, ts(1000L), "a", 1.0),
      KeyedEvent(1L, ts(5000L), "a", 2.0),    // same session (gap 10s)
      KeyedEvent(1L, ts(60000L), "a", 3.0))   // new session
    input.addData(KeyedEvent(9L, ts(500000L), "z", 0.0)) // watermark flush
    val q = input.toDS()
      .withWatermark("ts", "1 second")
      .groupBy(session_window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("s_start"), col("key"), col("cnt"))
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess").filter(col("key") === 1L).collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == Seq((1000L, 2L), (60000L, 1L)), s"got ${got.toSeq}")
    } finally q.stop()
  }
}
