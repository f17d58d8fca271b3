package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermark-ordered CEP (SeqPattern.detectOrdered): out-of-order
  * arrival across micro-batches must not corrupt the pattern. */
class OrderedCepSpec extends SparkSpec {

  import SeqPattern._

  // 3 consecutive login failures within 10 s (the reference's
  // login-fail scenario), STRICT contiguity
  private val steps = Seq(
    Step("f1", Set("fail")), Step("f2", Set("fail")), Step("f3", Set("fail")))

  private def run(batches: Seq[Seq[KeyedEvent]]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val wm = in.toDS().withWatermark("ts", "5 seconds").as[KeyedEvent]
    val name = s"cep_${batches.hashCode.abs}"
    val q = SeqPattern.detectOrdered(wm, steps, withinMs = 10000L, strict = true)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)).toSeq
    } finally q.stop()
  }

  test("out-of-order fail arrives in a later batch, match still found") {
    // fails at t=1,3 arrive first; the t=2 fail arrives NEXT batch
    // (within the 5 s watermark delay). Arrival order 1,3,2 would
    // break strict contiguity; event-time order 1,2,3 matches.
    val out = run(Seq(
      Seq(KeyedEvent(7L, ts(1000L), "fail", 1), KeyedEvent(7L, ts(3000L), "fail", 1)),
      Seq(KeyedEvent(7L, ts(2000L), "fail", 1), KeyedEvent(7L, ts(20000L), "ok", 0)),
      Seq(KeyedEvent(7L, ts(40000L), "ok", 0)))) // advances wm past the fails
    assert(out == Seq((7L, 1000L, 3000L)),
      s"expected the reordered 1-2-3 fail run, got $out")
  }

  test("an interleaved success event (late-arriving) breaks the strict chain") {
    val out = run(Seq(
      Seq(KeyedEvent(8L, ts(1000L), "fail", 1), KeyedEvent(8L, ts(3000L), "fail", 1)),
      Seq(KeyedEvent(8L, ts(2000L), "ok", 0), KeyedEvent(8L, ts(20000L), "ok", 0)),
      Seq(KeyedEvent(8L, ts(40000L), "ok", 0))))
    assert(out.isEmpty, s"strict chain should be broken by the t=2 success: $out")
  }

  test("quiet key: buffered matches emit via the event-time timer, " +
    "without any further traffic on the key") {
    // key 7 completes a match but its events are younger than the
    // watermark when they arrive; the watermark then advances ONLY via
    // key 9's traffic and key 7 never appears again. The event-time
    // timer must wake key 7, mature its buffer, and emit — previously
    // (NoTimeout) the match was held hostage until the key itself
    // received another event.
    val out = run(Seq(
      Seq(KeyedEvent(7L, ts(1000L), "fail", 1), KeyedEvent(7L, ts(2000L), "fail", 1),
        KeyedEvent(7L, ts(3000L), "fail", 1)),
      Seq(KeyedEvent(9L, ts(60000L), "ok", 0)),   // watermark -> 55 s
      Seq(KeyedEvent(9L, ts(61000L), "ok", 0))))  // key 7's timer fires
    assert(out.contains((7L, 1000L, 3000L)),
      s"quiet key's match never emitted: $out")
  }

  test("order invariance: bounded-lateness random delivery == in-order pure run") {
    val s = spark
    import s.implicits._
    // Random sequences delivered out of order (displacement <= 3 s,
    // under the 5 s watermark delay, so nothing is dropped) must yield
    // EXACTLY the in-order pure-NFA result — the detectOrdered
    // contract, checked against runPure instead of hand-picked cases.
    val relaxed = Seq(Step("a", Set("A")), Step("b", Set("B")))
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 12 + rnd.nextInt(8)
      val main = (0 until n).map(i => KeyedEvent(1L, ts((i + 1) * 1000L),
        Seq("A", "B", "N")(rnd.nextInt(3)), i.toDouble))
      // two far-future flushes in SEPARATE batches: the first advances
      // the watermark past every main event; the second delivers new
      // data for the key so the group function runs again and the NFA
      // consumes the now-mature buffer (watermark visible to a batch
      // is the one computed at the END of the previous batch)
      val flush1 = KeyedEvent(1L, ts(1000000L), "N", -1.0)
      val flush2 = KeyedEvent(1L, ts(1001000L), "N", -2.0)
      val events = main :+ flush1 :+ flush2
      // shuffle within consecutive blocks of 4: displacement <= 3 s
      val delivery = main.grouped(4).flatMap(g => rnd.shuffle(g)).toSeq
      implicit val sqlCtx = s.sqlContext
      val in = MemoryStream[KeyedEvent]
      val wm = in.toDS().withWatermark("ts", "5 seconds").as[KeyedEvent]
      val name = s"cep_inv_$seed"
      val q = SeqPattern.detectOrdered(wm, relaxed, withinMs = 6000L,
          strict = false, NoSkip)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      val got =
        try {
          (delivery.grouped(5).toSeq :+ Seq(flush1) :+ Seq(flush2)).foreach { b =>
            in.addData(b: _*); q.processAllAvailable()
          }
          spark.table(name).collect().map(_.getSeq[Double](3).toList).toSet
        } finally q.stop()
      val expect = SeqPattern.runPure(events, relaxed, 6000L,
        strict = false, NoSkip).map(_.values.toList).toSet
      assert(got == expect, s"seed=$seed: streaming $got != pure $expect")
    }
  }

  test("streaming MATCH_RECOGNIZE: parsed pattern text over an out-of-order stream") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // same pattern family as the batch pat_mr query
    val pat = MrParser.parse(
      "PATTERN (S E{2}) WITHIN 10 SECONDS " +
      "DEFINE S AS kind = 'signup', E AS kind = 'error'")
    val in = MemoryStream[KeyedEvent]
    val wm = in.toDS().withWatermark("ts", "5 seconds").as[KeyedEvent]
    val q = SeqPattern.detectOrdered(wm, pat.steps, pat.withinMs,
        strict = true, pat.skip, pat.greedy)
      .writeStream.format("memory").queryName("cep_mr")
      .outputMode(OutputMode.Append()).start()
    try {
      // signup and second error first; first error arrives a batch late
      in.addData(KeyedEvent(3L, ts(1000L), "signup", 0),
        KeyedEvent(3L, ts(4000L), "error", 2))
      q.processAllAvailable()
      in.addData(KeyedEvent(3L, ts(2000L), "error", 1),
        KeyedEvent(3L, ts(20000L), "ok", 0))
      q.processAllAvailable()
      in.addData(KeyedEvent(3L, ts(40000L), "ok", 0))
      q.processAllAvailable()
      val out = spark.table("cep_mr").collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
      assert(out.toSeq == Seq((3L, 1000L, 4000L)),
        s"expected signup(1s)->error(2s)->error(4s), got ${out.toSeq}")
    } finally q.stop()
  }

  test("events beyond the watermark stay buffered, not fed early") {
    // only one batch: watermark stays at -inf after it, nothing mature
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[KeyedEvent]
    val wm = in.toDS().withWatermark("ts", "5 seconds").as[KeyedEvent]
    val q = SeqPattern.detectOrdered(wm, steps, 10000L, strict = true)
      .writeStream.format("memory").queryName("cep_buf")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        KeyedEvent(9L, ts(1000L), "fail", 1), KeyedEvent(9L, ts(2000L), "fail", 1),
        KeyedEvent(9L, ts(3000L), "fail", 1))
      q.processAllAvailable()
      assert(spark.table("cep_buf").count() == 0,
        "events emitted before the watermark matured them")
      in.addData(KeyedEvent(9L, ts(30000L), "ok", 0)) // wm -> 25000
      q.processAllAvailable()
      in.addData(KeyedEvent(9L, ts(31000L), "ok", 0)) // trigger with wm past fails
      q.processAllAvailable()
      assert(spark.table("cep_buf").count() == 1)
    } finally q.stop()
  }
}
