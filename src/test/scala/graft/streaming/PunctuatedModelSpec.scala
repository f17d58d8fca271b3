package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import scala.collection.mutable

/** PunctuatedWindows.tumbling vs a BRUTE-FORCE model, on seeded-random
  * per-key event sequences the example spec never enumerates.
  *
  * The model is an independent from-scratch formulation (not a replay
  * of the operator's incremental state machine): for every arrival
  * prefix it recomputes the per-key watermark as max(ts − delay) over
  * the prefix, declares an event LATE iff its window end ≤ the
  * watermark before its own arrival, and fires window [ws, we) at the
  * FIRST arrival whose emitted watermark reaches we — counting only
  * the prefix's non-late members of that window, attributing the
  * firing to that arrival.
  *
  * Events are fed ONE PER MICRO-BATCH so arrival order is pinned by
  * batch order (the operator's intra-batch order is covered by the
  * example-based PunctuatedWindowsSpec); timestamps are odd while the
  * delay is even, so no watermark ever ties a window end exactly.
  */
class PunctuatedModelSpec extends SparkSpec {

  private val WIN = 10000L; private val DELAY = 4000L
  private val T0 = 1585015920000L

  private type Out = (Long, Long, Long, Double, Long) // key, ws, cnt, sum, firedBy

  private def model(events: Seq[KeyedEvent]): Seq[Out] = {
    val out = mutable.ArrayBuffer.empty[Out]
    events.map(_.key).distinct.foreach { k =>
      val arr = events.filter(_.key == k)
      // wmAfter(i): watermark emitted after arrival i
      val wmAfter = arr.scanLeft(Long.MinValue) {
        (w, e) => math.max(w, e.ts.getTime - DELAY)
      }.tail
      def ws(e: KeyedEvent) = Math.floorDiv(e.ts.getTime, WIN) * WIN
      def late(i: Int) = { // vs the watermark BEFORE arrival i
        val before = if (i == 0) Long.MinValue else wmAfter(i - 1)
        ws(arr(i)) + WIN <= before
      }
      val windows = arr.indices.filterNot(late).map(i => ws(arr(i))).distinct
      windows.foreach { w =>
        // first arrival whose emitted watermark passes the window end
        arr.indices.find(wmAfter(_) >= w + WIN).foreach { f =>
          val members = arr.indices
            .filter(i => i <= f && !late(i) && ws(arr(i)) == w)
          out += ((k, w, members.size.toLong,
            members.map(arr(_).value).sum, arr(f).ts.getTime))
        }
      }
    }
    out.sortBy(o => (o._1, o._2)).toSeq
  }

  test("random single-event batches match the brute-force model") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 24).map { _ =>
        KeyedEvent(1L + rnd.nextInt(2),
          ts(T0 + rnd.nextInt(60) * 1000L + 2 * rnd.nextInt(400) + 1),
          "e", rnd.nextInt(10).toDouble)
      }
      val in = MemoryStream[KeyedEvent]
      val q = PunctuatedWindows.tumbling(in.toDS(), WIN, DELAY)
        .writeStream.format("memory").queryName(s"punctprop$seed")
        .outputMode(OutputMode.Update()).start()
      try {
        events.foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table(s"punctprop$seed").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                     r.getDouble(3), r.getTimestamp(4).getTime))
          .sortBy(o => (o._1, o._2)).toSeq
        assert(got == model(events),
          s"seed $seed:\n got   $got\n model ${model(events)}")
      } finally q.stop()
    }
  }
}
