package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One window firing. `firedBy` is the event time of the element whose
  * punctuated watermark emission closed the window — the observable
  * that distinguishes punctuated from periodic assignment. */
case class PunctWindowOut(key: Long, windowStart: Timestamp,
                          cnt: Long, sum: Double, firedBy: Timestamp)

private[streaming] case class PunctState(
    wm: Long, open: Map[Long, (Long, Double)])

/** Tumbling event-time windows driven by a PUNCTUATED watermark
  * (reference `MyPunctuatedWatermark.scala:18-25`,
  * `WatermarkDemo.scala:170-199`): the generator emits
  * `wm = max(ts seen) - delay` after EVERY element and stays silent in
  * `onPeriodicEmit`. Versus Spark's built-in model — where the
  * watermark advances only at micro-batch boundaries (the moral
  * equivalent of Flink's 200 ms periodic emit) — the observable
  * difference is WHEN a window fires: here the window [ws, we) closes
  * on the exact element whose `ts - delay >= we`, mid-batch, with the
  * firing attributed to that element (`firedBy`), not to the batch
  * boundary.
  *
  * Spark's `withWatermark` cannot express this (its watermark is
  * computed from the PREVIOUS batch's max), so the operator manages
  * event time itself in keyed state and never declares a Spark
  * watermark:
  *
  *   - per-key state = (wm, open windows). The per-KEY watermark
  *     models Flink's per-parallel-instance generator (one generator
  *     per source subtask; keys here = subtasks). There is no
  *     cross-key min — a key's windows fire on that key's own
  *     elements, which is exactly parallelism-N Flink where a subtask
  *     only sees its own partition's watermark until an exchange.
  *   - elements are processed in micro-batch arrival order (Flink's
  *     arrival order; any shuffle reordering maps to the same
  *     nondeterminism Flink has at parallelism > 1).
  *   - element with window end <= wm at arrival => dropped late (the
  *     reference demo's "迟到太多" row 1585015949000 at wm 10:12:30).
  *   - after ingesting each element, wm advances to ts - delay if
  *     larger; every open window with end <= wm fires ONCE and purges
  *     (allowedLateness 0, the demo's configuration).
  *
  * State is O(open windows within the delay horizon) per key — the
  * same bound Flink's window operator holds — so the operator
  * survives unbounded streams: nothing buffers raw elements, only
  * (cnt, sum) pre-aggregates, and fired windows leave state
  * immediately. A stalled watermark (no new elements) keeps windows
  * open indefinitely, exactly like the reference's silent
  * onPeriodicEmit.
  */
object PunctuatedWindows {
  implicit val outEnc: Encoder[PunctWindowOut] = Encoders.product[PunctWindowOut]
  implicit val stEnc: Encoder[PunctState] = Encoders.product[PunctState]

  /** @param ds       keyed events; no Spark watermark — event time is
    *                 managed inside the operator (see scaladoc)
    * @param windowMs tumbling window size
    * @param delayMs  the generator's maxDelay: wm = max(ts) - delayMs */
  def tumbling(ds: Dataset[KeyedEvent], windowMs: Long,
               delayMs: Long): Dataset[PunctWindowOut] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[PunctState, PunctWindowOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, events, state: GroupState[PunctState]) =>
          var st = state.getOption.getOrElse(PunctState(Long.MinValue, Map.empty))
          val fired = scala.collection.mutable.ListBuffer.empty[PunctWindowOut]
          events.foreach { e =>
            val t = e.ts.getTime
            val ws = Math.floorDiv(t, windowMs) * windowMs
            val open =
              if (ws + windowMs <= st.wm) st.open // too late: dropped
              else {
                val (c, s) = st.open.getOrElse(ws, (0L, 0.0))
                st.open.updated(ws, (c + 1, s + e.value))
              }
            // punctuated emission AFTER the element (Flink calls
            // onEvent once the element is already in its window)
            val wm = math.max(st.wm, t - delayMs)
            val (closing, still) = open.partition { case (w, _) => w + windowMs <= wm }
            closing.toSeq.sortBy(_._1).foreach { case (w, (c, s)) =>
              fired += PunctWindowOut(key, new Timestamp(w), c, s, e.ts)
            }
            st = PunctState(wm, still)
          }
          state.update(st)
          fired.iterator
      }
  }
}
