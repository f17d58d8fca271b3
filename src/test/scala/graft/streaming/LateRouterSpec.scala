package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-row late-data side channel (WatermarkDemo.scala:207-300
  * `sideOutputLateData`): unlike LateDataSpec's accounting-only
  * mitigation, LateRouter delivers the late ROWS — tagged, not
  * dropped — so a pipeline can quarantine them in their own sink. */
class LateRouterSpec extends SparkSpec {

  test("rows are tagged late iff older than watermark - lateness; none are lost") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val routed = LateRouter.route[Long, KeyedEvent](
      input.toDS().withWatermark("ts", "1 second"),
      _.key, _.ts.getTime, allowedLatenessMs = 2000L)
    val q = routed
      .select(col("row.kind").as("kind"), col("row.ts").as("ts"),
        col("late"))
      .writeStream.format("memory").queryName("routed")
      .outputMode("append").start()
    try {
      // batch 1: fresh query, watermark 0 -> nothing can be late
      input.addData(KeyedEvent(1L, ts(100000L), "seed", 1.0))
      q.processAllAvailable()
      // watermark now 99s (100s - 1s delay). batch 2:
      //   t=98.5s  within grace (98.5 + 2 >= 99)      -> on-time
      //   t=96.9s  beyond grace (96.9 + 2 < 99)       -> late
      //   t=101s   ahead of watermark                 -> on-time
      input.addData(
        KeyedEvent(1L, ts(98500L), "grace", 1.0),
        KeyedEvent(2L, ts(96900L), "old", 1.0),
        KeyedEvent(1L, ts(101000L), "fresh", 1.0))
      q.processAllAvailable()
      val rows = spark.table("routed").collect()
        .map(r => r.getString(0) -> r.getBoolean(2)).toMap
      assert(rows === Map(
        "seed" -> false, "grace" -> false, "old" -> true, "fresh" -> false))
      // the defining property vs the built-in drop: the late row is
      // DELIVERED (4 rows out for 4 rows in), just tagged
      assert(spark.table("routed").count() === 4)
    } finally q.stop()
  }

  test("late stream splits to its own sink; on-time stream still aggregates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val routed = LateRouter.route[Long, KeyedEvent](
      input.toDS().withWatermark("ts", "1 second"),
      _.key, _.ts.getTime, allowedLatenessMs = 0L)
    // multi-sink split (StreamPipelines pattern): quarantine + main
    val q = routed.writeStream.outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[Routed[KeyedEvent]], _: Long) =>
          val b = batch.toDF().cache()
          try {
            b.filter(col("late")).select(col("row.kind").as("kind"))
              .write.mode("append").format("noop").save()
            b.filter(col("late")).select(col("row.kind"))
              .collect().foreach(r => LateRouterSpec.quarantined.add(r.getString(0)))
            LateRouterSpec.mainCount.addAndGet(
              b.filter(!col("late")).count())
            ()
          } finally { b.unpersist(); () }
      }.start()
    try {
      input.addData(KeyedEvent(1L, ts(50000L), "a", 1.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(10000L), "stale", 1.0),
        KeyedEvent(1L, ts(51000L), "b", 1.0))
      q.processAllAvailable()
      assert(LateRouterSpec.quarantined.contains("stale"))
      assert(LateRouterSpec.mainCount.get() === 2L) // a and b, not stale
    } finally q.stop()
  }

  test("routeWindowed tags exactly what a windowed aggregate drops") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val src = input.toDS().withWatermark("ts", "1 second")
    val routed = LateRouter.routeWindowed[Long, KeyedEvent](
      src, _.key, _.ts.getTime, windowMs = 10000L, allowedLatenessMs = 0L)
      .select(col("row.kind").as("kind"), col("late"))
    val agg = src.groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("cnt"))
    val q1 = routed.writeStream.format("memory").queryName("rw")
      .outputMode("append").start()
    val q2 = agg.writeStream.format("memory").queryName("rwagg")
      .outputMode("update").start()
    try {
      input.addData(KeyedEvent(1L, ts(100000L), "seed", 1.0))
      q1.processAllAvailable(); q2.processAllAvailable()
      // watermark 99s. t=94s: window [90,100) end=100 > 99 -> the
      // aggregate KEEPS it although the row itself is sub-watermark
      // (route() would tag it late; routeWindowed must not).
      // t=85s: window [80,90) end=90 <= 99 -> dropped.
      input.addData(KeyedEvent(1L, ts(94000L), "recoverable", 1.0),
        KeyedEvent(2L, ts(85000L), "expired", 1.0))
      q1.processAllAvailable(); q2.processAllAvailable()
      val tags = spark.table("rw").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(tags === Map(
        "seed" -> false, "recoverable" -> false, "expired" -> true))
      // parity with the aggregate: [90,100) got the late row...
      val w90 = spark.table("rwagg")
        .filter(col("window.start") === ts(90000L))
        .select("cnt").collect().map(_.getLong(0))
      assert(w90.contains(1L), s"aggregate should count t=94s, got $w90")
      // ...and [80,90) never materialized
      assert(spark.table("rwagg")
        .filter(col("window.start") === ts(80000L)).collect().isEmpty)
    } finally { q1.stop(); q2.stop() }
  }
}

object LateRouterSpec {
  val quarantined = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val mainCount = new java.util.concurrent.atomic.AtomicLong(0L)
}
