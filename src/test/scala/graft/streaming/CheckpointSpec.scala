package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

/** Checkpoint/recovery (§2.11: checkpointing + exactly-once state) and
  * stream-static join (broadcast-state pattern,
  * BroadcastProcessFuncApp.scala:8-38): the engine-side guarantees the
  * reference gets from Flink checkpoints + broadcast state. */
class CheckpointSpec extends SparkSpec {

  test("stateful agg recovers its state from the checkpoint across restarts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDS().groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_v"))

    input.addData(KeyedEvent(1L, ts(1000L), "a", 1.0),
      KeyedEvent(1L, ts(2000L), "a", 2.0))
    val q1 = agg.writeStream.format("memory").queryName("ck1")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    try { q1.processAllAvailable() } finally q1.stop()

    // restart from the same checkpoint: prior state must survive
    input.addData(KeyedEvent(1L, ts(3000L), "a", 4.0))
    val q2 = agg.writeStream.format("memory").queryName("ck2")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete()).start()
    try {
      q2.processAllAvailable()
      val row = spark.table("ck2").filter(col("key") === 1L).collect().head
      assert(row.getLong(1) == 3L, s"count lost across restart: $row")
      assert(row.getDouble(2) == 7.0)
    } finally q2.stop()
  }

  test("stream-static join enriches a stream against a table (broadcast state)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("key", "tier")
    val input = MemoryStream[KeyedEvent]
    input.addData(KeyedEvent(1L, ts(1000L), "a", 1.0),
      KeyedEvent(2L, ts(2000L), "b", 2.0),
      KeyedEvent(3L, ts(3000L), "c", 3.0))
    val q = input.toDS().join(broadcast(dim), Seq("key"), "left")
      .select("key", "tier")
      .writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally q.stop()
  }
}
