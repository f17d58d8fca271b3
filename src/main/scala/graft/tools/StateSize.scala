package graft.tools

import java.nio.file.Files

import graft.core.Sessions
import graft.streaming.{Changelog, KeyedEvent, LateWindow, SeqPattern}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

/** Streaming state-store size gate (r13 verdict #7): run the three
  * heaviest stateful operators over a LONG generated stream under the
  * RocksDB state store and commit their per-batch state-row peaks as
  * an artifact — the streaming analogue of what MemExec did for the
  * driver-heap claims. Each operator's scaladoc claims its state is
  * bounded by horizon/keyspace DENSITY, independent of stream length;
  * this tool asserts the claimed ceiling on stateOperators metrics
  * (numRowsTotal; memoryUsedBytes shipped unasserted — RocksDB
  * reports approximate sizes) across enough batches that a
  * stream-length-proportional leak would blow through it.
  *
  *   - seqpattern: SeqPattern.detectOrdered, 50 keys x 40 batches,
  *     each batch one A-anchor + 3 B's per key advancing 30 s, WITHIN
  *     60 s. State rows = keys with live state; quiet keys must be
  *     state.remove()'d by the event-time timer. Bound 150 (50 keys
  *     + removal lagging a couple watermark updates); final <= 5
  *     after a quiet advance past every horizon.
  *   - latewindow: LateWindow.tumbling 60 s windows, 5 s delay, 30 s
  *     allowedLateness, same key/batch shape. State rows = OPEN
  *     (key, window) groups — <= ~3 windows/key inside the lateness
  *     horizon. Bound 250; final <= 5.
  *   - changelog_complete: Changelog.attachComplete over a complete-
  *     mode groupBy(key) aggregate with a 20-key keyspace, 40
  *     batches. State rows = keyspace, not stream length. Bound 25
  *     (final stays at the keyspace — complete mode never evicts).
  *
  * Run: sbt "runMain graft.tools.StateSize [outJson]"
  *   (default STATE_SIZE.json; exit 1 on any bound violation)
  */
object StateSize {
  private val Keys = 50
  private val Batches = 40

  /** Temp dirs (streaming checkpoints with RocksDB SSTs, snapshot and
    * changelog parquet) — registered here and deleted in main's
    * finally, so refresh_gates reruns don't accumulate in /tmp. */
  private val tmpDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix).toString
    tmpDirs += d
    d
  }
  private def cleanupTmp(): Unit = tmpDirs.foreach { d =>
    val root = java.nio.file.Paths.get(d)
    if (Files.exists(root))
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
  }

  private case class OpStats(maxRows: Long, finalRows: Long, maxMem: Long)

  /** Drive `batches` feed rounds, recording stateOperators totals. */
  private def drive(q: StreamingQuery,
                    feed: Int => Unit, batches: Int): OpStats = {
    var maxRows = 0L; var maxMem = 0L; var fin = 0L
    (0 until batches).foreach { b =>
      feed(b)
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val mem = p.stateOperators.map(_.memoryUsedBytes).sum
        maxRows = math.max(maxRows, rows)
        maxMem = math.max(maxMem, mem)
        fin = rows
      }
    }
    OpStats(maxRows, fin, maxMem)
  }

  private def seqpattern(spark: SparkSession): OpStats = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import SeqPattern._
    val input = MemoryStream[KeyedEvent]
    val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).any,
      Step("c", Set("C")))
    val q = SeqPattern.detectOrdered(
      input.toDS().withWatermark("ts", "5 seconds").as[KeyedEvent],
      steps, withinMs = 60000L, strict = false)
      .writeStream.format("noop")
      .option("checkpointLocation",
        tmp("graft-ss-seq"))
      .outputMode(OutputMode.Append()).start()
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val stats = drive(q, { b =>
      // never anchor at epoch 0: Spark drops rows at-or-before the
      // INITIAL watermark 0 (SeqPattern.detectOrdered scaladoc)
      val base = 100000L + b * 30000L
      input.addData((0 until Keys).flatMap { k =>
        KeyedEvent(k.toLong, ts(base), "A", b * 100.0 + k) +:
          (1 to 3).map(i =>
            KeyedEvent(k.toLong, ts(base + i * 5000L), "B", b * 100.0 + k + i))
      })
    }, Batches)
    // quiet advance past every horizon so live keys' timers fire
    input.addData(KeyedEvent(9999L, ts(100000L + Batches * 30000L + 900000L), "N", 0.0))
    q.processAllAvailable()
    input.addData(KeyedEvent(9999L, ts(100000L + Batches * 30000L + 910000L), "N", 0.0))
    q.processAllAvailable()
    val fin = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    stats.copy(finalRows = fin)
  }

  private def latewindow(spark: SparkSession): OpStats = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val q = LateWindow.tumbling(input.toDS(), windowMs = 60000L,
      delayMs = 5000L, latenessMs = 30000L)
      .writeStream.format("noop")
      .option("checkpointLocation",
        tmp("graft-ss-late"))
      .outputMode(OutputMode.Update()).start()
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val stats = drive(q, { b =>
      val base = 100000L + b * 30000L
      input.addData((0 until Keys).flatMap { k =>
        (0 until 4).map(i =>
          KeyedEvent(k.toLong, ts(base + i * 7000L), "e", b * 100.0 + k + i))
      })
    }, Batches)
    input.addData(KeyedEvent(9999L, ts(100000L + Batches * 30000L + 900000L), "e", 0.0))
    q.processAllAvailable()
    input.addData(KeyedEvent(9999L, ts(100000L + Batches * 30000L + 910000L), "e", 0.0))
    q.processAllAvailable()
    val fin = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    stats.copy(finalRows = fin)
  }

  private def changelogComplete(spark: SparkSession): OpStats = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedEvent]
    val agg = input.toDF()
      .groupBy(pmod(col("key"), lit(20)).as("k"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = Changelog.attachComplete(agg, Seq("k"),
      tmp("graft-ss-snap"),
      tmp("graft-ss-log"))
      .option("checkpointLocation",
        tmp("graft-ss-cl"))
      .start()
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val stats = drive(q, { b =>
      val base = 100000L + b * 30000L
      input.addData((0 until Keys).map(k =>
        KeyedEvent(k.toLong, ts(base + k), "e", b * 100.0 + k)))
    }, Batches)
    q.stop()
    stats
  }

  def main(args: Array[String]): Unit = {
    val outJson = if (args.length > 0) args(0) else "STATE_SIZE.json"
    val spark = Sessions.build("graft-statesize")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val ops = Seq(
      ("seqpattern", () => seqpattern(spark), 150L, 5L),
      ("latewindow", () => latewindow(spark), 250L, 5L),
      ("changelog_complete", () => changelogComplete(spark), 25L, 25L))
    val results = try ops.map { case (name, run, boundMax, boundFinal) =>
      val st = run()
      val ok = st.maxRows <= boundMax && st.finalRows <= boundFinal
      println(f"[statesize] $name%-19s max_rows ${st.maxRows}%5d (bound $boundMax) " +
        f"final ${st.finalRows}%5d (bound $boundFinal) max_mem ${st.maxMem}%9d B " +
        (if (ok) "ok" else " << BOUND VIOLATED"))
      (name, st, boundMax, boundFinal, ok)
    } finally cleanupTmp()
    val failed = results.count(!_._5)
    val entries = results.map { case (n, st, bm, bf, ok) =>
      s""""$n":{"batches":$Batches,"keys":$Keys,"max_rows":${st.maxRows},"final_rows":${st.finalRows},"max_mem_bytes":${st.maxMem},"bound_max_rows":$bm,"bound_final_rows":$bf,"ok":$ok}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"action":"streaming-state-size","store":"rocksdb","n_failed":$failed,"ops":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[statesize] ${results.size - failed}/${results.size} ops within bounds -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
