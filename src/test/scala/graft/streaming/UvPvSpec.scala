package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** UV/PV per window (hot-item UvCountByWindow / PV apps): PV = count,
  * UV = approx_count_distinct (the HLL++ analogue of the reference's
  * Bloom-filter UV, UvCountWithBloomByWindow.scala:13-39) — streaming,
  * watermark-closed windows. */
class UvPvSpec extends SparkSpec {

  test("windowed PV and approx-UV per closed window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val base = 1700000000000L - (1700000000000L % 60000)
    // 30 events from 10 distinct users in one 1m window
    input.addData((0 until 30).map(i =>
      KeyedEvent(i % 10, ts(base + i * 1000L), "pv", 1.0)))
    input.addData(KeyedEvent(99L, ts(base + 600000L), "flush", 0.0))
    val q = input.toDS()
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("pv"), approx_count_distinct(col("key")).as("uv"))
      .select(col("window.start").as("ws"), col("pv"), col("uv"))
      .writeStream.format("memory").queryName("uvpv")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val row = spark.table("uvpv")
        .filter(col("ws") === ts(base)).collect().head
      assert(row.getLong(1) == 30L)
      val uv = row.getLong(2).toDouble
      assert(math.abs(uv - 10.0) / 10.0 < 0.05, s"uv=$uv")
    } finally q.stop()
  }
}
