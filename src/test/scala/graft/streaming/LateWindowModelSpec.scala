package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import scala.collection.mutable

/** LateWindow.tumbling vs a BRUTE-FORCE model of the micro-batch
  * semantics, on seeded-random batch sequences the example spec
  * (LateWindowSpec) would never enumerate.
  *
  * The model replays Spark's contract one batch at a time:
  *   - rows below the batch-START watermark are dropped (late filter);
  *   - data groups update state against that watermark and re-fire
  *     when the emulated Flink watermark (sparkWM + L) has passed the
  *     window end;
  *   - groups WITHOUT data whose timeout expired are invoked as
  *     timed-out in the same batch;
  *   - the watermark advances to max(eventTime) − (D + L) at batch
  *     end, never backwards, and an advance triggers one extra
  *     no-data batch where expired timers fire (on-time firing or
  *     silent purge per the operator's two-timer state machine).
  *
  * Event times use odd millisecond offsets while D + L is even, so no
  * row ever ties the watermark exactly — the one boundary where the
  * engine's `<` vs `<=` choice could differ from the model's.
  */
class LateWindowModelSpec extends SparkSpec {

  private val WIN = 10000L; private val D = 2000L; private val L = 6000L
  private val B = 86400000L // epoch offset; Spark's initial watermark is 0

  private case class St(var cnt: Long, var sum: Double,
                        var firings: Int, var timer: Long)
  private type Out = (Long, Long, Long, Double, Int, Boolean)

  /** The reference model: feed batches, collect every emission. */
  private class Model {
    private var wm = 0L
    private var maxSeen = Long.MinValue
    private val state = mutable.Map.empty[(Long, Long), St]
    val emitted = mutable.ArrayBuffer.empty[Out]

    private def we(ws: Long) = ws + WIN

    private def fireTimeout(key: Long, ws: Long, st: St, w: Long): Unit =
      if (st.firings > 0 || w >= we(ws)) {
        if (st.firings == 0)
          emitted += ((key, ws, st.cnt, st.sum, 1, false))
        state.remove((key, ws))
      } else {
        st.firings = 1
        emitted += ((key, ws, st.cnt, st.sum, 1, false))
        st.timer = math.max(we(ws), w + 1)
      }

    private def timersOnly(w: Long, touched: Set[(Long, Long)]): Unit =
      state.toSeq.sortBy(_._1).foreach { case ((key, ws), st) =>
        if (!touched((key, ws)) && st.timer <= w) fireTimeout(key, ws, st, w)
      }

    def addBatch(events: Seq[KeyedEvent]): Unit = {
      val w = wm
      val survivors = events.filter(_.ts.getTime >= w)
      val touched = survivors.groupBy(e =>
        (e.key, Math.floorDiv(e.ts.getTime, WIN) * WIN))
      touched.toSeq.sortBy(_._1).foreach { case ((key, ws), es) =>
        val st = state.getOrElseUpdate((key, ws), St(0L, 0.0, 0, Long.MaxValue))
        if (w + L >= we(ws)) {
          // past the on-time point: PER-ELEMENT re-firing (event-time
          // order within the batch), preceded by the lagged on-time
          // firing of any buffered prefix
          if (st.firings == 0 && st.cnt > 0) {
            st.firings = 1
            emitted += ((key, ws, st.cnt, st.sum, 1, false))
          }
          es.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            st.cnt += 1; st.sum += e.value; st.firings += 1
            emitted += ((key, ws, st.cnt, st.sum, st.firings, st.firings > 1))
          }
        } else es.foreach { e => st.cnt += 1; st.sum += e.value }
        st.timer = math.max(if (st.firings == 0) we(ws) - L else we(ws), w + 1)
      }
      timersOnly(w, touched.keySet)
      if (events.nonEmpty)
        maxSeen = math.max(maxSeen, events.map(_.ts.getTime).max)
      val nw = math.max(wm, maxSeen - (D + L))
      if (nw > wm) { wm = nw; timersOnly(wm, Set.empty) } // extra batch
    }
  }

  test("random batch sequences match the brute-force model (seeded)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(42)
    for (scenario <- 1 to 6) {
      val in = MemoryStream[KeyedEvent]
      val name = s"latewin_model_$scenario"
      val q = LateWindow.tumbling(in.toDS(), WIN, D, L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      val model = new Model
      try {
        // monotone-ish max time so the watermark crawls, with random
        // backdated events exercising every lateness regime
        var front = B
        for (_ <- 1 to 6) {
          val n = rnd.nextInt(4) + 1
          val batch = (1 to n).map { _ =>
            front += rnd.nextInt(8) * 1000L
            val back = rnd.nextInt(4) match {
              case 0 => 0L                                // on-time
              case 1 => rnd.nextInt(8000)                 // mildly late
              case 2 => rnd.nextInt(20000)                // window-late
              case _ => rnd.nextInt(40000)                // often too late
            }
            val t = math.max(B + 1, front - back) / 2 * 2 + 1 // odd ms
            KeyedEvent(1L + rnd.nextInt(2), ts(t), "e", (t % 1000).toDouble)
          }
          in.addData(batch: _*)
          q.processAllAvailable()
          model.addBatch(batch)
        }
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
                     r.getDouble(3), r.getInt(4), r.getBoolean(5)))
          .toSeq.sorted
        val want = model.emitted.toSeq.sorted
        assert(got == want,
          s"scenario $scenario diverged:\n got=$got\nwant=$want")
      } finally q.stop()
    }
  }
}
