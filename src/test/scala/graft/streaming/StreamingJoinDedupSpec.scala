package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Tagged(key: Long, ts: Timestamp, v: Double)

/** Stream-stream interval join + watermark dedup, matching the
  * reference's interval-join semantics (DataStreamFunc.scala:1640-1685)
  * and dedup-within-state (QueryTest.scala:1219-1248 streaming form). */
class StreamingJoinDedupSpec extends SparkSpec {

  test("stream-stream interval join pairs within (t, t+10s]") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val a = MemoryStream[Tagged]
    val b = MemoryStream[Tagged]
    a.addData(Tagged(1L, ts(10000L), 1.0), Tagged(2L, ts(10000L), 2.0))
    b.addData(
      Tagged(1L, ts(15000L), 10.0),  // within
      Tagged(1L, ts(25000L), 20.0),  // outside
      Tagged(2L, ts(10000L), 30.0))  // not strictly after
    val joined = StreamPipelines.intervalJoin(
      a.toDF(), b.toDF(), "key", "10 seconds")
      .select(col("l.key"), col("r.v"))
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ij").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSet == Set((1L, 10.0)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Tagged]
    input.addData(Tagged(1L, ts(1000L), 1.0), Tagged(1L, ts(2000L), 1.0))
    val q = StreamPipelines.dedupWithinWatermark(
      input.toDF(), "ts", Seq("key"), "30 seconds")
      .writeStream.format("memory").queryName("dd")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(Tagged(1L, ts(3000L), 1.0)) // still within horizon
      q.processAllAvailable()
      assert(spark.table("dd").count() == 1)
    } finally q.stop()
  }
}
