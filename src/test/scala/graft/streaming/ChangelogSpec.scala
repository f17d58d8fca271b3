package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Changelog reconstruction must reproduce the reference's retract
  * stream semantics (toRetractStream, TableSQLFunc.scala:846-855):
  * first value per key is +I; every later change is a -U of the old
  * value followed by a +U of the new. */
class ChangelogSpec extends SparkSpec {

  test("update-mode agg emits +I then -U/+U pairs across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val base = Files.createTempDirectory("graft-cl").toString
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDS().groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))
    val q = Changelog.attach(agg, Seq("key"), s"$base/snap", s"$base/log").start()
    try {
      input.addData(KeyedEvent(1L, ts(1000L), "a", 10.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(2000L), "a", 5.0),
        KeyedEvent(2L, ts(2000L), "b", 7.0))
      q.processAllAvailable()
      val logRows = spark.read.parquet(s"$base/log")
        .select("key", "cnt", "sum_v", "op", "batch_id").collect()
      val log = logRows
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
        .toSet
      assert(log == Set(
        (1L, 1L, 10.0, "+I"),   // batch 0
        (1L, 1L, 10.0, "-U"),   // batch 1: key 1 changed
        (1L, 2L, 15.0, "+U"),
        (2L, 1L, 7.0, "+I")),   // batch 1: key 2 new
        s"got $log")
      // snapshot holds the latest values
      val snap = spark.read.parquet(s"$base/snap").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(snap == Map(1L -> (2L, 15.0), 2L -> (1L, 7.0)))
    } finally q.stop()
  }
}
