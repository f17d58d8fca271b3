package graft.streaming

import graft.{SparkSpec, TestSpark}
import graft.SparkEntry
import graft.core.{Exact, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** A row of the driver's `events` table, for MemoryStream replay. */
case class EvRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** Stream/batch PARITY over the real driver data: the reference is a
  * streaming engine, so its test queries hold in both execution modes.
  * Here the sf0.001 `events` parquet is replayed through a
  * MemoryStream in 5 SCRAMBLED batches (rows assigned by event_id
  * hash, so event time interleaves arbitrarily across batches), the
  * streaming twin of an oracle-checked batch query runs in append
  * mode with a large watermark delay, a far-future sentinel then
  * advances the watermark past every real window, and the flushed
  * sink must equal the batch query's rows EXACTLY — same windows,
  * same counts, same decimal-exact sums. This pins the engine-level
  * guarantee the per-operator streaming specs assume: out-of-order
  * delivery within the watermark bound cannot change any result. */
class StreamBatchParitySpec extends SparkSpec {

  private def replay(): (MemoryStream[EvRow], Seq[Seq[EvRow]], java.sql.Timestamp) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EvRow].collect().toSeq
    val batches = rows.groupBy(e => math.abs(e.event_id * 2654435761L % 5))
      .toSeq.sortBy(_._1).map(_._2)
    val maxTs = rows.map(_.ts.getTime).max
    // sentinel 100 days ahead: watermark (delay 30 d) lands 70 d past
    // the last real event, closing every real window
    val sentinel = new java.sql.Timestamp(maxTs + 100L * 86400 * 1000)
    (MemoryStream[EvRow], batches, sentinel)
  }

  private def runAppend(df: org.apache.spark.sql.DataFrame, name: String)
                       (input: MemoryStream[EvRow], batches: Seq[Seq[EvRow]],
                        sentinel: java.sql.Timestamp): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(EvRow(-1L, sentinel, -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
  }

  test("spendreport: streaming hourly per-user sums == batch tw_spendreport") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    val stream = input.toDS().withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(Exact.dsum(col("value")).as("spend"))
      .select(col("window.start").as("w_start"), col("user_id"), col("spend"))
    runAppend(stream, "parity_spend")(input, batches, sentinel)
    val got = spark.table("parity_spend").filter(col("user_id") >= 0)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = SparkEntry.queries("tw_spendreport")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("tumble: streaming hourly per-type count+sum == batch tw_tumble") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    val stream = input.toDS().withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("cnt"), col("sum_v"))
    runAppend(stream, "parity_tumble")(input, batches, sentinel)
    val got = spark.table("parity_tumble")
      .filter(col("event_type") =!= "sentinel").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = SparkEntry.queries("tw_tumble")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("hop: streaming sliding windows == batch tw_hop (4 windows/event)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    val stream = input.toDS().withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))
    runAppend(stream, "parity_hop")(input, batches, sentinel)
    val got = spark.table("parity_hop")
      .filter(col("event_type") =!= "sentinel").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("tw_hop")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("session: streaming gap-merge state == batch tw_session") {
    // the strongest parity case: batch assembles sessions with a
    // sort-based pass, streaming MERGES overlapping session state
    // across scrambled batches — same gaps must close identically
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    val stream = input.toDS().withWatermark("ts", "30 days")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"),
        col("cnt"), col("sum_v"))
    runAppend(stream, "parity_session")(input, batches, sentinel)
    val got = spark.table("parity_session").filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val want = SparkEntry.queries("tw_session")(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("tumble offset: streaming offset windows == batch tw_tumble_offset") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    val stream = input.toDS().withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "1 hour", "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("cnt"))
    runAppend(stream, "parity_offset")(input, batches, sentinel)
    // the sentinel row lands in its own far-future window: drop it by
    // window start, not by type (this twin carries no type column)
    val cut = sentinel.getTime - 86400000L
    val got = spark.table("parity_offset")
      .filter(col("w_start") < new java.sql.Timestamp(cut)).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val want = SparkEntry.queries("tw_tumble_offset")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("cumulate: streaming expanding slices == batch tw_cumulate") {
    // CUMULATE = explode each row into its expanding slice-ends BEFORE
    // one windowed agg — the same single-aggregation plan in both
    // modes, so append mode accepts it (no chained aggregation)
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    // the watermark must ride the GROUPING time column: after the
    // slice explode the event-time attribute is w_end, so re-anchor
    // the watermark there (grouping by a watermarked timestamp column
    // is the supported append-mode shape for non-window() groupings)
    val stream = input.toDS()
      .withColumn("w_start", window(col("ts"), "4 hours").getField("start"))
      .withColumn("w_end", explode(sequence(
        date_trunc("hour", col("ts")) + expr("INTERVAL 1 HOUR"),
        col("w_start") + expr("INTERVAL 4 HOURS"),
        expr("INTERVAL 1 HOUR"))))
      .withWatermark("w_end", "30 days")
      .groupBy("w_start", "w_end")
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"))
    runAppend(stream, "parity_cumulate")(input, batches, sentinel)
    val cut = new java.sql.Timestamp(sentinel.getTime - 86400000L)
    val got = spark.table("parity_cumulate")
      .filter(col("w_start") < cut).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = SparkEntry.queries("tw_cumulate")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want,
      s"stream-batch divergence: ${(got diff want) ++ (want diff got)}")
  }

  test("funnel: stateful funnelTrack == batch agg_funnel stage counts") {
    // custom-state parity (not a built-in window): the buffered
    // event-time fold must reproduce the batch min-chain exactly
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rows = Tables.load(spark, TestSpark.sf0001, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EvRow].collect().toSeq
    val batches = rows.groupBy(e => math.abs(e.event_id * 2654435761L % 5))
      .toSeq.sortBy(_._1).map(_._2)
    val sentinel = new java.sql.Timestamp(
      rows.map(_.ts.getTime).max + 100L * 86400 * 1000)
    val input = MemoryStream[KeyedEvent]
    val stream = StatefulOps.funnelTrack(
      input.toDS().withWatermark("ts", "30 days"),
      "signup", "click", "purchase")
    val q = stream.writeStream.format("memory").queryName("parity_funnel")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b.map(e => KeyedEvent(e.user_id, e.ts, e.event_type, e.value)))
        q.processAllAvailable()
      }
      input.addData(KeyedEvent(-1L, sentinel, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("parity_funnel").filter(col("key") >= 0)
      .groupBy("stage").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = SparkEntry.queries("agg_funnel")(spark, TestSpark.sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == want, s"stream-batch divergence: $got vs $want")
    // a user emits each stage at most once across all batches
    val perUser = spark.table("parity_funnel").filter(col("key") >= 0)
      .groupBy("key", "stage").count().filter(col("count") > 1).count()
    assert(perUser == 0L)
  }

  test("global stats: streaming complete-mode agg == batch scan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, _) = replay()
    // complete mode: no watermark needed, the final emission covers
    // all input; distinct aggregates are unsupported on streams, so
    // the twin is count/sum/min/max (the agg_global_stats core)
    val stream = input.toDS()
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    val q = stream.writeStream.format("memory").queryName("parity_stats")
      .outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("parity_stats").collect().head
    val want = Tables.load(spark, TestSpark.sf0001, "events")
      .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .collect().head
    assert(got.getLong(0) == want.getLong(0) &&
      got.getDouble(1) == want.getDouble(1) &&
      got.getDouble(2) == want.getDouble(2) &&
      got.getDouble(3) == want.getDouble(3),
      s"stream-batch divergence: got $got want $want")
  }

  test("cascading rollup: streaming minute partials + store rollup == batch tw_rollup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (input, batches, sentinel) = replay()
    // Spark refuses two chained streaming aggregations in append mode,
    // so the production cascade is: watermark-closed MINUTE partials
    // stream into a partial store via foreachBatch (each window-key
    // emits exactly ONCE — asserted), and the HOUR level re-aggregates
    // the store — the streaming-warehouse materialized-rollup pattern
    // tw_rollup expresses in batch. Decimals stay decimal in the
    // store so the re-aggregation is order-independent.
    val store = scala.collection.mutable.Map
      .empty[(Long, String), (Long, java.math.BigDecimal)]
    val minute = input.toDS().withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast(Exact.Dec)).as("sumd"))
      .select(col("window.start").as("w_min"), col("event_type"),
        col("cnt"), col("sumd"))
    val q = minute.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          val k = (r.getTimestamp(0).getTime, r.getString(1))
          assert(!store.contains(k), s"minute partial $k emitted twice")
          store(k) = (r.getLong(2), r.getDecimal(3))
        }
      }.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(EvRow(-1L, sentinel, -1L, "sentinel", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = store.toSeq
      .filterNot(_._1._2 == "sentinel")
      .groupBy { case ((mMs, et), _) =>
        (Math.floorDiv(mMs, 3600000L) * 3600000L, et) }
      .map { case ((hMs, et), ms) =>
        (new java.sql.Timestamp(hMs), et, ms.size.toLong,
          ms.map(_._2._1).sum,
          ms.map(_._2._2).reduce(_ add _).doubleValue)
      }.toSet
    val want = SparkEntry.queries("tw_rollup")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == want,
      s"cascade divergence: ${(got diff want) ++ (want diff got)}")
  }
}
