package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class ProfileOut(key: Long, totalEvents: Long, kinds: Map[String, Long],
                      recent: Seq[Double])

/** Spark 4 `transformWithState` port of the reference's keyed-state
  * trio (SURVEY §2.11: ValueState / ListState / MapState,
  * tutorial/.../State.scala:125-263) — a per-key profile maintained
  * with all three state kinds in one operator:
  *
  *   - ValueState[Long]  — running event count
  *   - MapState[String,Long] — per-kind counts (Flink MapState idiom)
  *   - ListState[Double] — last `keepRecent` values (ListState idiom)
  *
  * TTL is available per state via TTLConfig (State TTL /
  * StateTtlConfig semantics); NONE here since the specs drive
  * processing-time-free batches.
  */
class ProfileProcessor(keepRecent: Int)
    extends StatefulProcessor[Long, KeyedEvent, ProfileOut] {

  @transient private var countState: ValueState[Long] = _
  @transient private var kindState: MapState[String, Long] = _
  @transient private var recentState: ListState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    countState = getHandle.getValueState[Long]("count",
      Encoders.scalaLong, TTLConfig.NONE)
    kindState = getHandle.getMapState[String, Long]("kinds",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    recentState = getHandle.getListState[Double]("recent",
      Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[KeyedEvent],
                               timers: TimerValues): Iterator[ProfileOut] = {
    var n = if (countState.exists()) countState.get() else 0L
    rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
      n += 1
      val prev = if (kindState.containsKey(e.kind)) kindState.getValue(e.kind) else 0L
      kindState.updateValue(e.kind, prev + 1)
      recentState.appendValue(e.value)
    }
    countState.update(n)
    val recent = recentState.get().toSeq.takeRight(keepRecent)
    recentState.put(recent.toArray) // trim to bound the state
    val kinds = kindState.iterator().map(p => p._1 -> p._2).toMap
    Iterator.single(ProfileOut(key, n, kinds, recent))
  }
}

object ProfileProcessor {
  /** Wire the processor onto a keyed stream. */
  def profile(ds: Dataset[KeyedEvent], keepRecent: Int): Dataset[ProfileOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new ProfileProcessor(keepRecent),
        TimeMode.None(), OutputMode.Update())
  }
}
