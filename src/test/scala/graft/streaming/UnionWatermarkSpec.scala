package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

/** Watermark propagation across a multi-input union (the reference's
  * two-source watermark rule: an operator's watermark is the MIN of
  * its inputs'): a window must NOT finalize while one input lags, and
  * must finalize once both have advanced past it. Append mode makes
  * the finalization observable — rows only emit when the min
  * watermark passes the window end.
  */
class UnionWatermarkSpec extends SparkSpec {

  test("unioned streams finalize windows on the MIN input watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val a = MemoryStream[KeyedEvent]
    val b = MemoryStream[KeyedEvent]
    def wm(m: MemoryStream[KeyedEvent]) =
      m.toDS().withWatermark("ts", "2 seconds")
    val counts = wm(a).unionByName(wm(b))
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("key"), col("cnt"))
    val q = counts.writeStream.format("memory").queryName("uw")
      .outputMode(OutputMode.Append()).start()
    try {
      // both streams contribute to window [0, 10)
      a.addData(KeyedEvent(1L, ts(1000L), "x", 1.0))
      b.addData(KeyedEvent(1L, ts(2000L), "x", 1.0))
      q.processAllAvailable()
      // stream A races ahead past the window; B stays behind — the
      // union watermark is min(98s, 0s-ish) so NOTHING finalizes
      a.addData(KeyedEvent(1L, ts(100000L), "x", 0.0))
      q.processAllAvailable()
      assert(spark.table("uw").isEmpty,
        "window finalized while one input's watermark lagged")
      // B catches up -> min watermark passes 10s -> window emits with
      // BOTH streams' rows counted
      b.addData(KeyedEvent(1L, ts(100000L), "x", 0.0))
      q.processAllAvailable()
      b.addData(KeyedEvent(1L, ts(120000L), "x", 0.0))
      q.processAllAvailable()
      val got = spark.table("uw").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(2))).toMap
      assert(got.get(0L).contains(2L),
        s"window [0,10) must count rows from BOTH inputs: $got")
    } finally q.stop()
  }
}
