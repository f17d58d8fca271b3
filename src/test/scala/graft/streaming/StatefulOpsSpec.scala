package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Golden tests for the stateful operator library, mirroring the
  * reference's exercise/solution harness style (TaxiRideTestBase:
  * deterministic source → operator → collected sink → assert). */
class StatefulOpsSpec extends SparkSpec {

  private def runAppend[T](dsw: org.apache.spark.sql.Dataset[T], name: String)(
      assertFn: Array[org.apache.spark.sql.Row] => Unit): Unit = {
    val q = dsw.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable(); assertFn(spark.table(name).collect()) }
    finally q.stop()
  }

  test("ingest drops NULL rows but keeps NaN measures (contiguity-preserving)") {
    // na.drop would silently drop NaN doubles too — under strict
    // contiguity a vanished row can FABRICATE matches the engine
    // should reject, so NaN must flow through like any other value
    val s = spark
    import s.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val df = Seq[(java.lang.Long, java.sql.Timestamp, String, java.lang.Double)](
      (1L, ts, "a", 1.0),
      (1L, ts, "a", Double.NaN), // present value: must survive
      (1L, ts, null, 2.0),       // null kind: dropped
      (null, ts, "a", 3.0),      // null key: dropped
      (1L, null, "a", 4.0),      // null ts: dropped
      (1L, ts, "a", null)        // null measure: dropped
    ).toDF("key", "ts", "kind", "value")
    val kept = KeyedEvent.ingest(df).collect()
    assert(kept.length == 2, s"expected 1.0 + NaN rows, got ${kept.toList}")
    assert(kept.count(_.value.isNaN) == 1)
  }

  test("count tumbling window fires every n events per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    input.addData((1 to 7).map(i => KeyedEvent(1L, ts(i * 1000L), "e", i.toDouble)))
    input.addData((1 to 3).map(i => KeyedEvent(2L, ts(i * 1000L), "e", 10.0)))
    runAppend(StatefulOps.countTumblingWindow(input.toDS(), 3), "cw") { rows =>
      val byKey = rows.groupBy(_.getLong(0))
      // key 1: 7 events -> windows (1+2+3), (4+5+6); 7th stays pending
      assert(byKey(1L).map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet ==
        Set((0L, 3L, 6.0), (1L, 3L, 15.0)))
      // key 2: exactly one full window
      assert(byKey(2L).map(r => (r.getLong(1), r.getDouble(3))).toSet ==
        Set((0L, 30.0)))
    }
  }

  test("fraud detector: small-then-large within gap alerts, beyond gap does not") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    input.addData(Seq(
      KeyedEvent(1L, ts(1000L), "tx", 0.5),    // small
      KeyedEvent(1L, ts(30000L), "tx", 600.0), // large, within 60s -> alert
      KeyedEvent(2L, ts(1000L), "tx", 0.5),    // small
      KeyedEvent(2L, ts(90000L), "tx", 600.0), // large, beyond 60s -> no alert
      KeyedEvent(3L, ts(1000L), "tx", 50.0),   // mid
      KeyedEvent(3L, ts(2000L), "tx", 600.0),  // large, no preceding small
      KeyedEvent(4L, ts(1000L), "tx", 0.5),    // small...
      KeyedEvent(4L, ts(2000L), "tx", 50.0),   // ...but a MID breaks the
      KeyedEvent(4L, ts(3000L), "tx", 600.0))) // pattern -> no alert
    runAppend(StatefulOps.fraudDetector(input.toDS(), 1.0, 500.0, 60000L), "fraud") { rows =>
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
      assert(rows.head.getDouble(4) == 600.0)
    }
  }

  test("match-with-timeout: matched pair emits, unmatched start times out via watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val wmInput = input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    input.addData(Seq(
      KeyedEvent(1L, ts(1000L), "order", 1.0),
      KeyedEvent(1L, ts(5000L), "pay", 9.0),    // matched within 10s
      KeyedEvent(2L, ts(1000L), "order", 1.0))) // never paid
    val out = StatefulOps.matchWithTimeout(wmInput, "order", "pay", 10000L)
    val q = out.writeStream.format("memory").queryName("tmo")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // advance the watermark far past key 2's deadline
      input.addData(KeyedEvent(9L, ts(60000L), "noise", 0.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(9L, ts(61000L), "noise", 0.0))
      q.processAllAvailable()
      val rows = spark.table("tmo").collect()
      val kinds = rows.map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kinds.contains((1L, "matched")), s"got ${rows.toSeq}")
      assert(kinds.contains((2L, "timeout")), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("match-with-timeout: an end arriving past the horizon still times out " +
    "the start (watermark lags arrivals)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    val wmInput = input.toDS().withWatermark("ts", "0 seconds").as[KeyedEvent]
    // start@1s and end@50s arrive in the SAME batch: the event-time
    // timer at 11s has not fired (watermark was 0), but the end proves
    // the horizon passed — a "timeout" must emit, not silence
    input.addData(Seq(
      KeyedEvent(1L, ts(1000L), "order", 1.0),
      KeyedEvent(1L, ts(50000L), "pay", 9.0)))
    val out = StatefulOps.matchWithTimeout(wmInput, "order", "pay", 10000L)
    val q = out.writeStream.format("memory").queryName("tmo2")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(KeyedEvent(9L, ts(60000L), "noise", 0.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(9L, ts(61000L), "noise", 0.0))
      q.processAllAvailable()
      val rows = spark.table("tmo2").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.count(_ == (1L, "timeout")) === 1, s"got ${rows.toSeq}")
      assert(!rows.contains((1L, "matched")), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("firstSeen emits exactly one row per key across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    input.addData(Seq(KeyedEvent(1L, ts(1000L), "a", 1.0),
      KeyedEvent(1L, ts(2000L), "b", 2.0), KeyedEvent(2L, ts(1500L), "c", 3.0)))
    val q = StatefulOps.firstSeen(input.toDS())
      .writeStream.format("memory").queryName("fs")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(3000L), "d", 4.0)) // second batch dup
      q.processAllAvailable()
      val rows = spark.table("fs").collect()
      assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      assert(rows.find(_.getLong(0) == 1L).get.getString(2) == "a")
    } finally q.stop()
  }

  test("SeqPattern: strict vs relaxed contiguity, within horizon, skip past match") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val steps = Seq(SeqPattern.Step("a", Set("A")), SeqPattern.Step("b", Set("B")))
    def run(strict: Boolean, name: String, events: Seq[KeyedEvent]) = {
      val input = MemoryStream[KeyedEvent]
      input.addData(events)
      val q = SeqPattern.detect(input.toDS(), steps, 10000L, strict)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable(); spark.table(name).collect() }
      finally q.stop()
    }
    val interleaved = Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(2000L), "C", 0.0), // breaks strict chain
      KeyedEvent(1L, ts(3000L), "B", 2.0))
    assert(run(strict = true, "sp_strict", interleaved).isEmpty)
    assert(run(strict = false, "sp_relaxed", interleaved).length == 1)
    // within horizon: B arrives too late
    val late = Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(20000L), "B", 2.0))
    assert(run(strict = false, "sp_late", late).isEmpty)
  }

  test("SeqPattern quantifiers: times(n) and optional steps") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def run(name: String, steps: Seq[SeqPattern.Step], events: Seq[KeyedEvent]) = {
      val input = MemoryStream[KeyedEvent]
      input.addData(events)
      val q = SeqPattern.detect(input.toDS(), steps, 60000L, strict = false)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable(); spark.table(name).collect() }
      finally q.stop()
    }
    // A{2} then B (login-fail times(2) shape)
    val twice = Seq(SeqPattern.Step("a", Set("A")).times(2),
      SeqPattern.Step("b", Set("B")))
    assert(run("sp_t1", twice, Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(2000L), "B", 2.0))).isEmpty) // only one A
    val hit = run("sp_t2", twice, Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(2000L), "A", 1.5),
      KeyedEvent(1L, ts(3000L), "B", 2.0)))
    assert(hit.length == 1 && hit.head.getSeq[Double](3) == Seq(1.0, 1.5, 2.0))
    // A C? B: matches with and without the optional C
    val opt = Seq(SeqPattern.Step("a", Set("A")),
      SeqPattern.Step("c", Set("C")).opt, SeqPattern.Step("b", Set("B")))
    assert(run("sp_o1", opt, Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(2000L), "B", 2.0))).length == 1)
    assert(run("sp_o2", opt, Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(1500L), "C", 9.0),
      KeyedEvent(1L, ts(2000L), "B", 2.0))).length == 1)
  }

  test("SeqPattern: NoSkip yields overlapping matches, aggregate DEFINE condition") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def run(name: String, steps: Seq[SeqPattern.Step],
            skip: SeqPattern.Skip, events: Seq[KeyedEvent]) = {
      val input = MemoryStream[KeyedEvent]
      input.addData(events)
      val q = SeqPattern.detect(input.toDS(), steps, 60000L,
          strict = false, skip = skip)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable(); spark.table(name).collect() }
      finally q.stop()
    }
    // A-B-C with a second A mid-flight when the first match completes:
    // SkipPastLastRow kills the pending partial, NoSkip/SkipToNext
    // (started after the match's first row) let it finish later.
    val abc = Seq(SeqPattern.Step("a", Set("A")),
      SeqPattern.Step("b", Set("B")), SeqPattern.Step("c", Set("C")))
    val events = Seq(
      KeyedEvent(1L, ts(1000L), "A", 1.0),
      KeyedEvent(1L, ts(2000L), "B", 2.0),
      KeyedEvent(1L, ts(3000L), "A", 3.0), // pending when match 1 fires
      KeyedEvent(1L, ts(4000L), "C", 4.0), // completes A1-B2-C4
      KeyedEvent(1L, ts(5000L), "B", 5.0),
      KeyedEvent(1L, ts(6000L), "C", 6.0)) // would complete A3-B5-C6
    assert(run("sk_past", abc, SeqPattern.SkipPastLastRow, events).length == 1)
    assert(run("sk_next", abc, SeqPattern.SkipToNext, events).length == 2)
    assert(run("sk_none", abc, SeqPattern.NoSkip, events).length == 2)
    // MATCH_RECOGNIZE-style DEFINE with aggregate: B.value must exceed
    // twice the average of the matched A values
    val aggSteps = Seq(
      SeqPattern.Step("a", Set("A")).times(2),
      SeqPattern.Step("b", Set("B")).where((v, prefix) =>
        v > 2.0 * prefix.sum / prefix.length))
    val lowB = Seq(
      KeyedEvent(1L, ts(1000L), "A", 10.0),
      KeyedEvent(1L, ts(2000L), "A", 20.0),
      KeyedEvent(1L, ts(3000L), "B", 25.0)) // avg=15, needs >30
    assert(run("agg_no", aggSteps, SeqPattern.SkipPastLastRow, lowB).isEmpty)
    val highB = lowB.init :+ KeyedEvent(1L, ts(3000L), "B", 35.0)
    assert(run("agg_yes", aggSteps, SeqPattern.SkipPastLastRow, highB).length == 1)
  }

  test("SeqPattern greedy vs reluctant oneOrMore (upTo)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def run(name: String, greedy: Boolean) = {
      val steps = SeqPattern.Step("a", Set("A")).upTo(3) :+
        SeqPattern.Step("b", Set("B"))
      val input = MemoryStream[KeyedEvent]
      input.addData(Seq(
        KeyedEvent(1L, ts(1000L), "A", 1.0),
        KeyedEvent(1L, ts(2000L), "A", 2.0),
        KeyedEvent(1L, ts(3000L), "B", 9.0)))
      val q = SeqPattern.detect(input.toDS(), steps, 60000L,
          strict = false, greedy = greedy)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable(); spark.table(name).collect() }
      finally q.stop()
    }
    val g = run("q_greedy", greedy = true)
    assert(g.length == 1 && g.head.getSeq[Double](3) == Seq(1.0, 2.0, 9.0)) // A A B
    // leftmost-match priority: the match still starts at the first A;
    // reluctant only shrinks the quantifier extent at the SAME start,
    // and both A's sit before the required B here
    val r = run("q_reluct", greedy = false)
    assert(r.length == 1 && r.head.getSeq[Double](3) == Seq(1.0, 2.0, 9.0))
  }

  test("SeqPattern reluctant trailing quantifier emits at first accepting state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def run(name: String, greedy: Boolean) = {
      val steps = SeqPattern.Step("a", Set("A")).upTo(3) // A{1,3} alone
      val input = MemoryStream[KeyedEvent]
      input.addData(Seq(
        KeyedEvent(1L, ts(1000L), "A", 1.0),
        KeyedEvent(1L, ts(2000L), "A", 2.0),
        KeyedEvent(1L, ts(3000L), "A", 3.0)))
      val q = SeqPattern.detect(input.toDS(), steps, 60000L,
          strict = false, greedy = greedy)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try { q.processAllAvailable(); spark.table(name).collect() }
      finally q.stop()
    }
    // reluctant: each A completes a shortest match immediately
    val r = run("tq_reluct", greedy = false)
    assert(r.map(_.getSeq[Double](3)).toSet ==
      Set(Seq(1.0), Seq(2.0), Seq(3.0)))
    // greedy: extends to the full quantifier bound before completing
    val g = run("tq_greedy", greedy = true)
    assert(g.length == 1 && g.head.getSeq[Double](3) == Seq(1.0, 2.0, 3.0))
  }

  test("stratifiedKSample: final state is arrival-order-independent and matches the batch min-k") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val rnd = new scala.util.Random(5L)
    val all = (1 to 60).map(i =>
      KeyedEvent(rnd.nextInt(30).toLong, ts(i * 1000L), s"s${i % 3}", 0.0))
    def runOrder(name: String, evs: Seq[Seq[KeyedEvent]]): Map[(String, Int), Long] = {
      val input = MemoryStream[KeyedEvent]
      val q = StatefulOps.stratifiedKSample(input.toDS(), 4)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        evs.foreach { batch => input.addData(batch); q.processAllAvailable() }
        val rows = spark.table(name).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
        // take each stratum's final (max-version) emission
        val lastVer = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        rows.filter { case (k, v, _, _) => v == lastVer(k) }
          .map { case (k, _, rk, key) => (k, rk) -> key }.toMap
      } finally q.stop()
    }
    val a = runOrder("ks_a", Seq(all.take(20), all.slice(20, 40), all.drop(40)))
    val b = runOrder("ks_b", Seq(rnd.shuffle(all)))
    assert(a == b, "kept sets diverge across arrival orders/batchings")
    // batch model: lowest-4 priorities per stratum
    val want = all.map(e => (e.kind, e.key)).distinct
      .map { case (k, key) =>
        (k, graft.functions.HashKernels.h32("ksample:" + key), key) }
      .groupBy(_._1).flatMap { case (k, g) =>
        g.sortBy(x => (x._2, x._3)).take(4).zipWithIndex
          .map { case ((_, _, key), i) => (k, i + 1) -> key }
      }
    assert(a == want, "streaming kept set diverges from the batch min-k")
  }

  test("cusumAlerts: sustained shift alarms, individually unremarkable samples do not") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[KeyedEvent]
    // mu=10, slack=1, h=6: samples of 12 add +1 each — no single point
    // is an outlier, but six in a row cross the threshold
    input.addData((1 to 5).map(i =>
      KeyedEvent(1L, ts(i * 1000L), "m", 12.0)))       // S reaches 5 — silent
    input.addData((6 to 8).map(i =>
      KeyedEvent(1L, ts(i * 1000L), "m", 12.0)))       // crosses 6 at i=6; resets
    // key 2: alternating around the mean — never accumulates
    input.addData((1 to 8).map(i =>
      KeyedEvent(2L, ts(i * 1000L), "m", if (i % 2 == 0) 8.0 else 12.0)))
    val q = StatefulOps.cusumAlerts(input.toDS(), mu = 10.0,
        slack = 1.0, h = 6.0)
      .writeStream.format("memory").queryName("cusum")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cusum").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime, r.getDouble(4)))
      // key 1: S = 1,2,3,4,5 (silent), 6 (= h, still silent — the alarm
      // needs S > h), 7 -> ONE alarm at t=7s with S=7, then reset; the
      // 8th sample restarts at 1. Key 2 never accumulates.
      assert(rows.toSeq == Seq((1L, 7000L, 7.0)),
        s"want exactly the t=7s alarm, got ${rows.toSeq}")
    } finally q.stop()
  }
}
