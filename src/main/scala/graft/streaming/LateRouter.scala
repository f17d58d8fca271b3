package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A row plus its lateness verdict: `late` = the row's event time was
  * more than the allowed lateness behind the query watermark when it
  * arrived. */
case class Routed[T](row: T, late: Boolean)

/** Per-row late-data side channel — the reference routes late elements
  * to an OutputTag side stream instead of silently dropping them
  * (WatermarkDemo.scala:207-300 `sideOutputLateData`;
  * ProcessFuncDemo.scala late-element tagging). Structured Streaming
  * has no side outputs and its stateful operators drop late rows
  * internally, so the engine's previous answer was accounting-only
  * (observe() + numRowsDroppedByWatermark, LateDataSpec).
  *
  * This operator closes the per-row gap: a ZERO-STATE
  * flatMapGroupsWithState pass that stores nothing and times out
  * nothing — it only reads `GroupState.getCurrentWatermarkMs` (the
  * batch-start watermark, the same "watermark at element arrival" a
  * Flink ProcessFunction sees) and tags each row instead of losing it.
  * Place it AFTER `withWatermark` and BEFORE the windowed aggregate;
  * `filter(late)` is the quarantine stream, routable to its own sink
  * via the multi-sink pattern (StreamPipelines.scala).
  *
  * Two lateness references, matching the reference's two late-data
  * surfaces:
  *   - `route` tags by the ROW's event time vs the watermark — what a
  *     Flink ProcessFunction sees for the element itself
  *     (ProcessFuncDemo late tagging). NOTE: this is STRICTER than a
  *     windowed aggregate's own drop rule (which drops by window END,
  *     not element time), so `filter(!late)` may withhold rows the
  *     aggregate would still have counted into a not-yet-expired
  *     window.
  *   - `routeWindowed` tags by the row's WINDOW END vs the watermark —
  *     Flink's `sideOutputLateData` rule (element late iff its window
  *     end + allowedLateness <= watermark), and with lateness 0 it is
  *     EXACTLY Structured Streaming's aggregate drop rule:
  *     `filter(!late)` feeds the aggregate precisely what it would
  *     have kept, and `filter(late)` is precisely what it would have
  *     dropped.
  *
  * Scale: cost is the one groupBy shuffle on the key (which the
  * downstream keyed aggregate needed anyway — the exchange is shared
  * when the keys match); per-group work is O(rows), state is zero, so
  * no key — however hot — accumulates anything. NoTimeout matters
  * twice: it keeps the operator stateless AND it is what makes Spark
  * deliver below-watermark input rows to the function at all (with
  * EventTimeTimeout the operator itself pre-drops them, and the late
  * rows would be unobservable — the exact behavior we are replacing).
  *
  * Flink-parity note: the first batch of a fresh query runs with
  * watermark 0, so nothing is ever late in it — identical to Flink,
  * where the watermark starts at Long.MinValue.
  */
object LateRouter {

  /** Tag each row with its lateness verdict.
    *
    * @param keyFn   grouping key — use the downstream aggregate's key
    *                so the shuffle is shared
    * @param eventMs event-time accessor (epoch millis)
    * @param allowedLatenessMs grace period: a row is late only when
    *                `eventMs + allowedLatenessMs < watermark`
    *                (Flink `allowedLateness`; 0 = watermark-strict) */
  def route[K, T](ds: Dataset[T], keyFn: T => K, eventMs: T => Long,
                  allowedLatenessMs: Long)(
      implicit ek: Encoder[K], eo: Encoder[Routed[T]]): Dataset[Routed[T]] =
    routeBy(ds, keyFn, r => eventMs(r) + allowedLatenessMs)

  /** Tag each row late iff its tumbling window of `windowMs` is
    * already beyond recovery: `windowEnd + allowedLatenessMs <=
    * watermark` — `sideOutputLateData` semantics, and (at lateness 0)
    * the exact keep/drop rule of a downstream
    * `groupBy(window(ts, windowMs))` aggregate. */
  def routeWindowed[K, T](ds: Dataset[T], keyFn: T => K, eventMs: T => Long,
                          windowMs: Long, allowedLatenessMs: Long)(
      implicit ek: Encoder[K], eo: Encoder[Routed[T]]): Dataset[Routed[T]] =
    routeBy(ds, keyFn, { r =>
      val end = (Math.floorDiv(eventMs(r), windowMs) + 1L) * windowMs
      end + allowedLatenessMs - 1L // late iff end + lateness <= wm
    })

  /** Shared core: a row is late iff `deadlineMs(row) < watermark`. */
  private def routeBy[K, T](ds: Dataset[T], keyFn: T => K,
                            deadlineMs: T => Long)(
      implicit ek: Encoder[K], eo: Encoder[Routed[T]]): Dataset[Routed[T]] = {
    implicit val es: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[Boolean, Routed[T]](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          val wm = state.getCurrentWatermarkMs()
          rows.map(r => Routed(r, deadlineMs(r) < wm))
      }
  }
}
