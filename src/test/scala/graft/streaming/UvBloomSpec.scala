package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Bounded-state streaming UV (StatefulOps.uvWithBloom — the
  * reference's bloom-filter unique-visitor counter): repeated visitors
  * never increment, counts are per tumbling window, and updates emit
  * each micro-batch. */
class UvBloomSpec extends SparkSpec {

  test("bloom UV: distinct per window, repeats free, cross-batch state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StatefulOps.uvWithBloom(in.toDS(), windowMs = 10000L)
      .writeStream.format("memory").queryName("uvb")
      .outputMode(OutputMode.Update()).start()
    def latest(): Map[Long, Long] = {
      // memory sink keeps every update row; latest per window wins
      val rows = spark.table("uvb").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      rows.zipWithIndex.groupBy(_._1._1)
        .map { case (w, vs) => w -> vs.maxBy(_._2)._1._2 }
    }
    try {
      // window [0,10s): visitors 1,2,2,3 -> 3 distinct
      in.addData(
        KeyedEvent(1L, ts(1000L), "pv", 0), KeyedEvent(2L, ts(2000L), "pv", 0),
        KeyedEvent(2L, ts(3000L), "pv", 0), KeyedEvent(3L, ts(4000L), "pv", 0))
      q.processAllAvailable()
      assert(latest() == Map(0L -> 3L))
      // next batch: repeats of 1 and 3 are free; 4 is new; a second
      // window starts with visitor 1 counted independently
      in.addData(
        KeyedEvent(1L, ts(5000L), "pv", 0), KeyedEvent(4L, ts(6000L), "pv", 0),
        KeyedEvent(3L, ts(7000L), "pv", 0), KeyedEvent(1L, ts(12000L), "pv", 0))
      q.processAllAvailable()
      assert(latest() == Map(0L -> 4L, 10000L -> 1L))
      // a wave of distinct visitors: count tracks exactly while the
      // bloom is sparse (65536 bits, ~200 visitors -> no collisions)
      in.addData((100L to 299L).map(u => KeyedEvent(u, ts(8000L), "pv", 0)): _*)
      q.processAllAvailable()
      assert(latest() == Map(0L -> 204L, 10000L -> 1L))
      // push the watermark (10 min lateness) past both windows' ends:
      // their bloom state times out and is reclaimed without emitting —
      // counts stand, and the new window counts independently
      in.addData(KeyedEvent(1L, ts(700000L), "pv", 0))
      q.processAllAvailable()
      assert(latest() == Map(0L -> 204L, 10000L -> 1L, 700000L -> 1L))
    } finally q.stop()
  }
}
