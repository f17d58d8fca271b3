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
  *     after a quiet advance past every horizon. A SECOND point at
  *     5,000 keys x 12 batches (r14 verdict #5) gates max_rows
  *     ratio ~100x — linear in keys while the batch axis shrank, so
  *     "state = O(keys x horizon), independent of stream length" is
  *     a measured two-point claim.
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
  private def cleanupTmp(): Unit =
    // Changelog.attachComplete derives a `<snapshotDir>__staged`
    // SIBLING for its atomic snapshot roll — it is not a registered
    // dir itself, so delete the sibling alongside each registered
    // root (ADVICE r14: ~4 KB of staged parquet leaked per run).
    tmpDirs.flatMap(d => Seq(d, d + "__staged"))
      .foreach(graft.core.Resources.deleteRecursively)

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

  /** Parameterized over `keys`/`batches` so the key axis can be
    * scaled independently of stream length (r14 verdict #5): the
    * 5,000-key point runs FEWER batches than the 50-key base, so a
    * max_rows ratio that still tracks keys (and only keys) pins the
    * two-point claim "state = O(keys × horizon), independent of
    * batch count" empirically. */
  private def seqpattern(spark: SparkSession, keys: Int, batches: Int): OpStats = {
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
      input.addData((0 until keys).flatMap { k =>
        KeyedEvent(k.toLong, ts(base), "A", b * 100.0 + k) +:
          (1 to 3).map(i =>
            KeyedEvent(k.toLong, ts(base + i * 5000L), "B", b * 100.0 + k + i))
      })
    }, batches)
    // quiet advance past every horizon so live keys' timers fire
    input.addData(KeyedEvent(-1L, ts(100000L + batches * 30000L + 900000L), "N", 0.0))
    q.processAllAvailable()
    input.addData(KeyedEvent(-1L, ts(100000L + batches * 30000L + 910000L), "N", 0.0))
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

  /** Key-axis scale point (r14 verdict #5): 100× the keys at ~1/3 the
    * batches. Its own max_rows bound scales linearly from the base
    * bound (150 → 15000), and the cross-point ratio gate below pins
    * linearity in keys directly. */
  private val ScaledKeys = 5000
  private val ScaledBatches = 12
  /** Per-point max_rows bounds for the seqpattern key-axis pair: each
    * tolerates removal lagging a couple watermark updates (~3× the
    * live keyspace); the scaled bound is the base bound scaled
    * linearly with the key axis — the claim under test. */
  private val SeqMaxRowsBound = 150L
  private val SeqScaledMaxRowsBound = SeqMaxRowsBound * (ScaledKeys / Keys)
  /** max_rows(5000 keys) / max_rows(50 keys) must read ~keys-ratio
    * (100×): well under it would mean the base point was measuring an
    * artifact; over it would mean super-linear state in keys. The
    * ratio bounds INHERIT each point's removal-lag allowance or the
    * gate flakes on a GC pause the per-point bounds were built to
    * absorb (review finding r15) — and they are DERIVED from the same
    * constants the per-point bounds use, not hardcoded copies of the
    * derivation (BENCH_NOTES r15 item 13c): lo = worst base lag with
    * the scaled point exact (ScaledKeys/SeqMaxRowsBound ≈ 33), hi =
    * worst scaled lag with the base exact (SeqScaledMaxRowsBound/Keys
    * = 300). The discriminating power is intact — the failure modes
    * sit decades away: state ∝ batches would read ~1x (the scaled
    * point runs FEWER batches), state ∝ keys² would read ~10000x. */
  private val KeyRatioLo = ScaledKeys.toDouble / SeqMaxRowsBound
  private val KeyRatioHi = SeqScaledMaxRowsBound.toDouble / Keys

  def main(args: Array[String]): Unit = {
    val outJson = if (args.length > 0) args(0) else "STATE_SIZE.json"
    val spark = Sessions.build("graft-statesize")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // per-op keyspace recorded per entry (ADVICE r14: the shared
    // Keys=50 constant mislabeled changelog_complete, whose true
    // keyspace — and the parameter its bound 25 is keyed to — is the
    // pmod(key, 20) = 20-group aggregate, not the 50 input keys)
    val ops = Seq(
      ("seqpattern", () => seqpattern(spark, Keys, Batches),
        Keys, Batches, SeqMaxRowsBound, 5L),
      (s"seqpattern_keys$ScaledKeys",
        () => seqpattern(spark, ScaledKeys, ScaledBatches),
        ScaledKeys, ScaledBatches, SeqScaledMaxRowsBound, 5L),
      ("latewindow", () => latewindow(spark), Keys, Batches, 250L, 5L),
      ("changelog_complete", () => changelogComplete(spark), 20, Batches, 25L, 25L))
    val results = try ops.map { case (name, run, keys, batches, boundMax, boundFinal) =>
      val st = run()
      val ok = st.maxRows <= boundMax && st.finalRows <= boundFinal
      println(f"[statesize] $name%-19s keys $keys%5d batches $batches%3d max_rows ${st.maxRows}%6d (bound $boundMax) " +
        f"final ${st.finalRows}%5d (bound $boundFinal) max_mem ${st.maxMem}%9d B " +
        (if (ok) "ok" else " << BOUND VIOLATED"))
      (name, st, keys, batches, boundMax, boundFinal, ok)
    } finally cleanupTmp()
    // two-point key-linearity gate: max_rows must track the key axis
    // (100×) while the batch axis SHRANK (40 → 12) — state is
    // keyspace-bounded, not stream-length-bounded, as a measured
    // two-point claim rather than a single plateau reading
    val keyRatio = (for {
      b <- results.find(_._1 == "seqpattern")
      sPt <- results.find(_._1 == s"seqpattern_keys$ScaledKeys")
      if b._2.maxRows > 0
    } yield sPt._2.maxRows.toDouble / b._2.maxRows).getOrElse(-1.0)
    val keyRatioOk = keyRatio >= KeyRatioLo && keyRatio <= KeyRatioHi
    println(f"[statesize] key-scaling max_rows ratio ${keyRatio}%.1fx at " +
      f"${ScaledKeys / Keys}x keys, ${ScaledBatches}/${Batches} batches " +
      f"(bound $KeyRatioLo-$KeyRatioHi) " + (if (keyRatioOk) "ok" else " << BOUND VIOLATED"))
    val failed = results.count(!_._7) + (if (keyRatioOk) 0 else 1)
    val entries = results.map { case (n, st, keys, batches, bm, bf, ok) =>
      s""""$n":{"batches":$batches,"keys":$keys,"max_rows":${st.maxRows},"final_rows":${st.finalRows},"max_mem_bytes":${st.maxMem},"bound_max_rows":$bm,"bound_final_rows":$bf,"ok":$ok}"""
    }.mkString("{", ",", "}")
    val keyJson =
      s"""{"base_keys":$Keys,"scaled_keys":$ScaledKeys,"base_batches":$Batches,"scaled_batches":$ScaledBatches,"max_rows_ratio":${graft.Bench.fmt3(keyRatio)},"bound":[$KeyRatioLo,$KeyRatioHi],"ok":$keyRatioOk}"""
    val json =
      s"""{"action":"streaming-state-size","store":"rocksdb","n_failed":$failed,"key_scaling":$keyJson,"ops":$entries,${graft.core.Provenance.jsonFields}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson), json.getBytes("UTF-8"))
    println(s"[statesize] ${results.size - results.count(!_._7)}/${results.size} ops within bounds -> $outJson")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
