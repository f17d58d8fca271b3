package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.col

/** Streaming proc-time temporal join (FOR SYSTEM_TIME AS OF proctime,
  * TableSQLFunc.scala:1462-1530): facts enrich with the latest dim
  * value seen so far; dim updates take effect for subsequent facts,
  * including across micro-batches. */
class TemporalJoinSpec extends SparkSpec {

  test("facts see the latest dim value, updates apply to later batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = StatefulOps.procTimeTemporalJoin(input.toDS(), dimKind = "rate")
      .writeStream.format("memory").queryName("ttj")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Seq(
        KeyedEvent(1L, ts(1000L), "rate", 1.10),
        KeyedEvent(1L, ts(2000L), "order", 0.0),   // sees 1.10
        KeyedEvent(1L, ts(3000L), "rate", 1.25),
        KeyedEvent(1L, ts(4000L), "order", 0.0)))  // sees 1.25
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(5000L), "order", 0.0)) // state carries 1.25
      input.addData(KeyedEvent(2L, ts(5000L), "order", 0.0)) // no dim yet -> NaN
      q.processAllAvailable()
      val rows = spark.table("ttj").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getDouble(4)))
        .sortBy(r => (r._1, r._2))
      assert(rows.length == 4, s"got ${rows.toSeq}")
      assert(rows.take(3).toSeq == Seq(
        (1L, 2000L, 1.10), (1L, 4000L, 1.25), (1L, 5000L, 1.25)))
      assert(rows(3)._1 == 2L && rows(3)._3.isNaN) // fact before any dim
    } finally q.stop()
  }

  test("event-time as-of: out-of-order dim does NOT leak into earlier facts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val wmInput = input.toDS().withWatermark("ts", "2 seconds").as[KeyedEvent]
    val q = StatefulOps.eventTimeAsOfJoin(wmInput, dimKind = "rate")
      .writeStream.format("memory").queryName("etaj")
      .outputMode(OutputMode.Append()).start()
    try {
      // one batch, arrival order scrambled vs event time:
      // rate@4000 arrives FIRST but must not apply to order@3000
      input.addData(Seq(
        KeyedEvent(1L, ts(4000L), "rate", 1.50),
        KeyedEvent(1L, ts(1000L), "rate", 1.10),
        KeyedEvent(1L, ts(3000L), "order", 0.0),
        KeyedEvent(1L, ts(5000L), "order", 0.0)))
      q.processAllAvailable()
      // advance the watermark past everything
      input.addData(KeyedEvent(9L, ts(60000L), "noise", 0.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(9L, ts(120000L), "noise", 0.0))
      q.processAllAvailable()
      val rows = spark.table("etaj").filter(col("key") === 1L).collect()
        .map(r => (r.getTimestamp(2).getTime, r.getDouble(4))).sortBy(_._1)
      assert(rows.toSeq == Seq((3000L, 1.10), (5000L, 1.50)), s"got ${rows.toSeq}")
    } finally q.stop()
  }
}
