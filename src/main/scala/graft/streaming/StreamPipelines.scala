package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Canonical Structured-Streaming pipelines (SURVEY §7.2 step 3).
  * Each takes an input DataFrame/Dataset so the same topology runs on
  * a MemoryStream (tests), a file stream, or Kafka (production) —
  * mirroring how the reference parameterizes sources
  * (ExerciseBase.rides swap, TaxiRideTestBase.java:25-99).
  */
object StreamPipelines {

  /** ClickEventCount (flink-prometheus ClickEventCount.java:65-104):
    * 15s tumbling count per page, bounded out-of-orderness 200 ms.
    * Invariant under the deterministic generator: every closed window
    * holds exactly EVENTS_PER_WINDOW per page. */
  def clickCount(events: DataFrame, tsCol: String = "ts",
                 pageCol: String = "page"): DataFrame =
    events
      .withWatermark(tsCol, "200 milliseconds")
      .groupBy(window(col(tsCol), "15 seconds"), col(pageCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col(pageCol), col("cnt"))

  /** Streaming dedup within the watermark horizon
    * (dropDuplicatesWithinWatermark — the engine analogue of
    * row_number()=1 dedup, QueryTest.scala:1219-1248, with state
    * eviction bounded by the watermark). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           keyCols: Seq[String], delay: String): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream interval join (DataStreamFunc.scala:1640-1685):
    * a-side joined to b-side events of the same key within
    * (a.ts, a.ts + window]; watermarks bound the join state. */
  def intervalJoin(a: DataFrame, b: DataFrame, key: String,
                   window: String): DataFrame = {
    val l = a.withWatermark("ts", "1 second").alias("l")
    val r = b.withWatermark("ts", "1 second").alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r.ts") > col("l.ts") &&
        col("r.ts") <= col("l.ts") + expr(s"INTERVAL $window"))
  }

  /** Streaming hot-items top-N (HotItems.scala:176-201 +
    * TopNHotItems.scala:15-52): watermarked sliding-window counts in
    * APPEND mode (a window emits once, when the watermark closes it —
    * the analogue of the reference's windowEnd+1 timer), then a
    * per-window rank in foreachBatch. Each closed window's top-N is
    * appended to the sink exactly once. */
  def hotItemsTopN(events: DataFrame, tsCol: String, keyCol: String,
                   size: String, slide: String, n: Int, delay: String)(
      sink: Dataset[org.apache.spark.sql.Row] => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), size, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.end").as("w_end"), col(keyCol), col("cnt"))
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ranked = batch.withColumn("rn",
            row_number().over(Window.partitionBy("w_end")
              .orderBy(col("cnt").desc, col(keyCol))))
          .filter(col("rn") <= n)
        sink(ranked)
        ()
      }
  }

  /** Dynamic control-stream pattern (BroadcastProcessFuncApp.scala:8-38:
    * a control stream updates rules that a data stream applies to every
    * element). Spark port: the control stream UPSERTS a rules table
    * (key-ed parquet); the data stream's foreachBatch re-reads and
    * broadcast-joins the CURRENT rules each micro-batch — rule updates
    * take effect on the next trigger, matching broadcast-state
    * propagation semantics. Returns the data-side writer. */
  def controlledFilter(data: DataFrame, rulesDir: String, key: String,
                       sink: Dataset[org.apache.spark.sql.Row] => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    data.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val rules =
          try Some(spark.read.parquet(rulesDir)) catch { case _: Throwable => None }
        rules match {
          case Some(r) =>
            sink(batch.join(broadcast(r), Seq(key), "inner")
              .filter(col("value") >= col("min_value")))
          case None => () // no rules yet: drop everything (closed-by-default)
        }
        ()
    }

  /** Control-side: upsert rules (key, min_value) into the rules table. */
  def updateRules(spark: org.apache.spark.sql.SparkSession, rulesDir: String,
                  rules: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    graft.sources.Writers.upsertParquet(
      rules.toDF("kind", "min_value"), rulesDir, Seq("kind"))
  }

  /** Side-output / multi-sink fanout via foreachBatch
    * (SideOutputApp1.scala:13-26; StatementSet multi-sink
    * TableSQLFunc.scala:532-590): one pass over each micro-batch,
    * split by predicate, two parquet sinks. The batch is cached so
    * the fanout reads the source once per trigger. The split is a
    * PARTITION — every row reaches exactly one sink: a NULL-valued
    * predicate routes to the B side (filter(pred) and filter(!pred)
    * would BOTH drop it, silently losing the row, which the side-
    * output contract forbids). */
  def splitToSinks(events: DataFrame, pred: org.apache.spark.sql.Column,
                   pathA: String, pathB: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.persist()
        batch.filter(coalesce(pred, lit(false))).write.mode("append").parquet(pathA)
        batch.filter(!coalesce(pred, lit(false))).write.mode("append").parquet(pathB)
        batch.unpersist()
        ()
    }
}
