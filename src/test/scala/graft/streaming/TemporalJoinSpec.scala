package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

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
}
