package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One firing of a lateness-tolerant tumbling window.
  * `firing` counts emissions for the window (1 = the on-time firing);
  * `late` marks re-firings triggered by allowed-late arrivals. */
case class LateWindowOut(key: Long, windowStart: Timestamp,
                         cnt: Long, sum: Double, firing: Int, late: Boolean)

/** Tumbling event-time window with Flink-style `allowedLateness`
  * RE-FIRING — the one windowing behavior Spark's built-in windowed
  * aggregation cannot express: Spark has a single knob (watermark
  * delay) where the reference has two (watermark delay D and
  * allowedLateness L; reference `WatermarkDemo.scala:207-300`, trigger
  * rule `ReadMe.md:1254-1257`): fire once when watermark passes the
  * window end, RE-fire per late element until watermark > end + L,
  * then drop later rows to a side output.
  *
  * The emulation maps Flink's two knobs onto one Spark watermark
  * exactly. Set the Spark watermark delay to D + L, so
  * `flinkWM = sparkWM + L`. Then, for a window [ws, we):
  *
  *   - ON-TIME FIRING  (flinkWM >= we)      <=> sparkWM >= we - L  —
  *     an event-time timer at we - L;
  *   - LATE RE-FIRE    (flinkWM <= we + L)  <=> data arriving while
  *     sparkWM < we — one emission PER LATE ELEMENT with the running
  *     aggregate (the reference's per-element trigger), elements
  *     ordered by event time within a batch (the deterministic
  *     stand-in for single-stream arrival order);
  *   - PURGE           (flinkWM > we + L)   <=> sparkWM >= we — the
  *     second event-time timer, firing WITHOUT emission (Flink purges
  *     silently);
  *   - SIDE OUTPUT: a row is Flink-side-output-late iff
  *     flinkWM > we + L at arrival, i.e. its event time t < we <=
  *     sparkWM — exactly the rows Spark's stateful-operator late-row
  *     filter already drops upstream. Route them with
  *     `LateRouter.route` on the same D + L watermark if a quarantine
  *     stream is needed; this operator never sees them.
  *
  * GroupState allows ONE timeout timestamp, so the two timers run as
  * a tiny state machine ordered by `firings`: 0 -> timer at we - L
  * (on-time fire), >=1 -> timer at we (purge). State per live window
  * is one (cnt, sum, firings) triple; total state is O(windows inside
  * their lateness horizon), the same bound Flink holds, so the
  * operator survives unbounded streams at any scale.
  */
object LateWindow {
  implicit val outEnc: Encoder[LateWindowOut] = Encoders.product[LateWindowOut]

  /** @param ds          keyed events; do NOT pre-set a watermark — this
    *                    operator sets it to delayMs + latenessMs (the
    *                    D + L mapping above is load-bearing)
    * @param windowMs    tumbling window size
    * @param delayMs     Flink watermark delay D (bounded out-of-orderness)
    * @param latenessMs  Flink allowedLateness L */
  def tumbling(ds: Dataset[KeyedEvent], windowMs: Long,
               delayMs: Long, latenessMs: Long): Dataset[LateWindowOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val L = latenessMs
    ds.withWatermark("ts", s"${delayMs + latenessMs} milliseconds")
      .groupByKey(e =>
        (e.key, Math.floorDiv(e.ts.getTime, windowMs) * windowMs))
      .flatMapGroupsWithState[(Long, Double, Int), LateWindowOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case ((key, ws), events, state: GroupState[(Long, Double, Int)]) =>
          val we = ws + windowMs
          val wm = state.getCurrentWatermarkMs
          if (state.hasTimedOut) {
            val (cnt, sum, firings) = state.get
            if (firings > 0 || wm >= we) {
              // purge point (sparkWM >= we <=> flinkWM > we + L). A
              // never-fired window purging here means the watermark
              // jumped the whole lateness horizon in one advance —
              // Flink would fire exactly once on that jump too.
              state.remove()
              if (firings == 0)
                Iterator(LateWindowOut(key, new Timestamp(ws), cnt, sum, 1, late = false))
              else Iterator.empty
            } else {
              // on-time firing: flinkWM = sparkWM + L has passed we
              state.update((cnt, sum, 1))
              state.setTimeoutTimestamp(math.max(we, wm + 1))
              Iterator(LateWindowOut(key, new Timestamp(ws), cnt, sum, 1, late = false))
            }
          } else {
            var (cnt, sum, firings) = state.getOption.getOrElse((0L, 0.0, 0))
            val out =
              if (wm + L >= we) {
                // window already past its on-time point: this batch's
                // rows are allowed-late arrivals, and the reference
                // re-fires PER ELEMENT (WatermarkDemo.scala:254-300) —
                // one emission per late row with the running aggregate,
                // in event-time order (the deterministic stand-in for
                // single-stream arrival order; Spark's group iterator
                // order is shuffle-dependent)
                val buf = scala.collection.mutable.ListBuffer.empty[LateWindowOut]
                if (firings == 0 && cnt > 0) {
                  // the on-time timer lagged the watermark advance into
                  // this batch: fire the buffered prefix once (Flink's
                  // watermark-passage firing), then the new rows re-fire
                  firings = 1
                  buf += LateWindowOut(key, new Timestamp(ws), cnt, sum, 1,
                    late = false)
                }
                events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
                  cnt += 1; sum += e.value; firings += 1
                  buf += LateWindowOut(key, new Timestamp(ws), cnt, sum,
                    firings, late = firings > 1)
                }
                buf.iterator
              } else {
                events.foreach { e => cnt += 1; sum += e.value }
                Iterator.empty
              }
            state.update((cnt, sum, firings))
            state.setTimeoutTimestamp(
              math.max(if (firings == 0) we - L else we, wm + 1))
            out
          }
      }
  }
}
