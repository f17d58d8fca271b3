package graft.streaming

import graft.SparkSpec
import graft.streaming.SeqPattern._

/** MATCH_RECOGNIZE frontend tests mirroring the reference's scenario
  * classes (TableSQLFunc.scala:1569-2240): pattern text → NFA steps →
  * batch detection over a tiny deterministic dataset. */
class MrParserSpec extends SparkSpec {

  private def detectBatch(events: Seq[KeyedEvent], spec: String,
                          strict: Boolean = true): Seq[MatchOut] = {
    val s = spark
    import s.implicits._
    val pat = MrParser.parse(spec)
    SeqPattern.detect(events.toDS(), pat.steps, pat.withinMs, strict,
      pat.skip, pat.greedy, flushEnd = true)
      .collect().toSeq.sortBy(_.startTs.getTime)
  }

  test("parse: quantifiers, WITHIN, AFTER MATCH, DEFINE kinds") {
    val p = MrParser.parse(
      "PATTERN (A B{2} C? D{1,3} E+) WITHIN 90 MINUTES " +
      "AFTER MATCH SKIP TO NEXT ROW " +
      "DEFINE A AS kind = 'a', B AS kind IN ('b', 'bb'), D AS value >= 5")
    assert(p.withinMs == 90L * 60000)
    assert(p.skip == SkipToNext)
    assert(p.greedy)
    val steps = SeqPattern.expand(p.steps)
    // A + B,B + C? + D{1,3}=1+2opt + E+ = 1+2+1+3+MaxRepeat
    assert(steps.length == 7 + MrParser.MaxRepeat)
    assert(steps(0).kinds == Set("a"))
    assert(steps(1).kinds == Set("b", "bb") && steps(2).kinds == Set("b", "bb"))
    assert(steps(3).optional)                      // C?
    assert(!steps(4).optional && steps(5).optional) // D{1,3}
    assert(steps(0).matches(KeyedEvent(1, ts(0), "a", 0), Nil))
    assert(!steps(0).matches(KeyedEvent(1, ts(0), "b", 0), Nil))
    // C has no DEFINE clause -> wildcard
    assert(steps(3).matches(KeyedEvent(1, ts(0), "anything", 0), Nil))
  }

  test("unparseable WITHIN / AFTER MATCH fail loudly instead of defaulting") {
    // an unsupported unit must not silently become an unbounded horizon
    intercept[IllegalArgumentException] {
      MrParser.parse(
        "PATTERN (A B) WITHIN 500 MILLISECONDS DEFINE A AS kind = 'a'")
    }
    // a typo'd AFTER MATCH must not silently become SKIP PAST LAST ROW
    intercept[IllegalArgumentException] {
      MrParser.parse(
        "PATTERN (A B) AFTER MATCH SKIP TO MARS DEFINE A AS kind = 'a'")
    }
    // lowercase clauses parse (the reference SQL is case-insensitive)
    assert(MrParser.parse(
      "PATTERN (A B) within 2 minutes after match skip to next row " +
        "DEFINE A AS kind = 'a'").withinMs == 120000L)
  }

  test("AVG and PREV operands compose with OR (nav-mode compiler)") {
    // grammar-admitted shapes that previously threw 'unsupported
    // navigation term' when OR routed them to the nav compiler
    val events = Seq(
      KeyedEvent(1L, ts(1000L), "a", 10.0),
      KeyedEvent(1L, ts(2000L), "y", 4.0),   // AVG(10,4)=7 > 5 -> matches
      KeyedEvent(2L, ts(1000L), "a", 10.0),
      KeyedEvent(2L, ts(2000L), "x", -100.0), // AVG=-45, but kind='x'
      KeyedEvent(3L, ts(1000L), "a", 0.0),
      KeyedEvent(3L, ts(2000L), "z", -10.0)) // AVG=-5, kind!='x': no match
    val out = detectBatch(events,
      "PATTERN (A B) DEFINE A AS kind = 'a', B AS AVG(value) > 5 OR kind = 'x'")
    assert(out.map(_.key).sorted == Seq(1L, 2L), s"got $out")
    // PREV as a comparison operand inside an OR disjunct
    val rise = Seq(
      KeyedEvent(1L, ts(1000L), "a", 5.0),
      KeyedEvent(1L, ts(2000L), "b", 7.0),   // 7 > PREV(5) -> matches
      KeyedEvent(2L, ts(1000L), "a", 5.0),
      KeyedEvent(2L, ts(2000L), "b", 3.0))   // falls, and kind != 'x'
    val out2 = detectBatch(rise,
      "PATTERN (A B) DEFINE A AS kind = 'a', " +
        "B AS value > PREV(value) OR kind = 'x'")
    assert(out2.map(_.key) == Seq(1L), s"got $out2")
  }

  test("parse: zero-or-more and open ranges, greedy and reluctant") {
    // B* = MaxRepeat all-optional repetitions; still greedy
    val star = MrParser.parse("PATTERN (A B* C) DEFINE A AS kind = 'a'")
    val starSteps = SeqPattern.expand(star.steps)
    assert(star.greedy)
    assert(starSteps.length == 2 + MrParser.MaxRepeat)
    assert(starSteps.slice(1, 1 + MrParser.MaxRepeat).forall(_.optional))
    // B*? flips the whole match selection to reluctant
    assert(!MrParser.parse("PATTERN (A B*? C) DEFINE A AS kind = 'a'").greedy)
    // {2,} = 2 required + (MaxRepeat-2) optional repetitions
    val open = MrParser.parse("PATTERN (A B{2,}) DEFINE A AS kind = 'a'")
    val openSteps = SeqPattern.expand(open.steps)
    assert(openSteps.length == 1 + MrParser.MaxRepeat)
    assert(!openSteps(1).optional && !openSteps(2).optional &&
      openSteps.drop(3).forall(_.optional))
    // {1,}? — the reference's reluctant open range — is + with reluctance
    assert(!MrParser.parse("PATTERN (A B{1,}?) DEFINE A AS kind = 'a'").greedy)
  }

  test("reluctant B*? stops each start at its FIRST completion (NO SKIP)") {
    // kinds: a then noise then two c's — the shortest match per start
    // takes the first c; the longer same-start branch must NOT emit a
    // second match at the second c
    val events = Seq(
      KeyedEvent(1, ts(1000), "a", 1), KeyedEvent(1, ts(2000), "n", 2),
      KeyedEvent(1, ts(3000), "c", 3), KeyedEvent(1, ts(4000), "c", 4))
    val ms = detectBatch(events,
      "PATTERN (A B*? C) AFTER MATCH NO SKIP " +
      "DEFINE A AS kind = 'a', C AS kind = 'c'")
    assert(ms.map(_.values.toList) == Seq(List(1.0, 2.0, 3.0)), s"got $ms")
    // greedy B*: the same start extends to the LAST c
    val gs = detectBatch(events,
      "PATTERN (A B* C) AFTER MATCH NO SKIP " +
      "DEFINE A AS kind = 'a', C AS kind = 'c'")
    assert(gs.map(_.values.toList) == Seq(List(1.0, 2.0, 3.0, 4.0)), s"got $gs")
  }

  test("parse errors: missing PATTERN, bad element, bad DEFINE term") {
    intercept[IllegalArgumentException](MrParser.parse("DEFINE A AS TRUE"))
    intercept[IllegalArgumentException](
      MrParser.parse("PATTERN (A{2,5}) DEFINE A AS TRUE"))
    intercept[IllegalArgumentException](
      MrParser.parse("PATTERN (A) DEFINE A AS frobnicate > 3"))
  }

  test("fixed sequence with WITHIN: matches inside horizon only") {
    val evs = Seq(
      KeyedEvent(1, ts(1000), "a", 1), KeyedEvent(1, ts(2000), "b", 2),
      KeyedEvent(1, ts(3000), "c", 3),  // within 10s -> match
      KeyedEvent(2, ts(1000), "a", 1), KeyedEvent(2, ts(2000), "b", 2),
      KeyedEvent(2, ts(60000), "c", 3)) // c beyond 10s -> no match
    val out = detectBatch(evs,
      "PATTERN (A B C) WITHIN 10 SECONDS DEFINE " +
      "A AS kind = 'a', B AS kind = 'b', C AS kind = 'c'")
    assert(out.map(_.key) == Seq(1L))
    assert(out.head.values == Seq(1.0, 2.0, 3.0))
  }

  test("V-shape with PREV(value): strictly down then strictly up") {
    // price path 5 4 2 3 6: STRT=5, DOWN=(4,2), UP=(3,6)
    val evs = Seq(5.0, 4.0, 2.0, 3.0, 6.0).zipWithIndex.map {
      case (v, i) => KeyedEvent(1, ts(1000L * (i + 1)), "px", v) }
    val out = detectBatch(evs,
      "PATTERN (STRT DOWN{1,3} UP{1,3}) DEFINE " +
      "DOWN AS value < PREV(value), UP AS value > PREV(value)")
    // greedy: longest match = the whole V
    assert(out.size == 1)
    assert(out.head.values == Seq(5.0, 4.0, 2.0, 3.0, 6.0))
  }

  test("reluctant marker emits the shortest match") {
    val evs = Seq(5.0, 4.0, 2.0, 3.0, 6.0).zipWithIndex.map {
      case (v, i) => KeyedEvent(1, ts(1000L * (i + 1)), "px", v) }
    val out = detectBatch(evs,
      "PATTERN (STRT DOWN{1,3} UP{1,3}?) DEFINE " +
      "DOWN AS value < PREV(value), UP AS value > PREV(value)")
    // shortest completion: 5 4 2 3 (single UP step)
    assert(out.head.values == Seq(5.0, 4.0, 2.0, 3.0))
  }

  test("AVG(value) iterative condition caps the running mean") {
    // B rows join only while avg(matched incl. candidate) < 15; the
    // over-budget b40 row is skipped over (relaxed contiguity — CEP
    // followedBy; under strict it would break the chain)
    val evs = Seq(
      KeyedEvent(1, ts(1000), "b", 10), KeyedEvent(1, ts(2000), "b", 12),
      KeyedEvent(1, ts(3000), "b", 40), // avg(10,12,40)=20.7 -> B ends
      KeyedEvent(1, ts(4000), "e", 0))
    val out = detectBatch(evs,
      "PATTERN (B{1,3} F) DEFINE " +
      "B AS kind = 'b' AND AVG(value) < 15, F AS kind = 'e'",
      strict = false)
    assert(out.size == 1)
    assert(out.head.values == Seq(10.0, 12.0, 0.0))
  }

  test("end-of-input flushes the accepting greedy match (flushEnd)") {
    // price path 5 4 2 3 then input ends: UP{1,3} met its minimum, so
    // the V is complete at its achieved extent
    val evs = Seq(5.0, 4.0, 2.0, 3.0).zipWithIndex.map {
      case (v, i) => KeyedEvent(1, ts(1000L * (i + 1)), "px", v) }
    val out = detectBatch(evs,
      "PATTERN (STRT DOWN{1,3} UP{1,3}) DEFINE " +
      "DOWN AS value < PREV(value), UP AS value > PREV(value)")
    // SkipPastLastRow end-flush: leftmost match only, overlaps dropped
    assert(out.size == 1)
    assert(out.head.values == Seq(5.0, 4.0, 2.0, 3.0))
  }

  test("negative guard !B: CEP notFollowedBy semantics") {
    val spec = "PATTERN (A !B C) WITHIN 1 HOUR DEFINE " +
      "A AS kind = 'a', B AS kind = 'b', C AS kind = 'c'"
    // no B between A and C -> match (relaxed contiguity skips X)
    val ok = detectBatch(Seq(
      KeyedEvent(1, ts(1000), "a", 1), KeyedEvent(1, ts(2000), "x", 0),
      KeyedEvent(1, ts(3000), "c", 3)), spec, strict = false)
    assert(ok.size == 1 && ok.head.values == Seq(1.0, 3.0))
    // a B in between kills the partial
    val no = detectBatch(Seq(
      KeyedEvent(1, ts(1000), "a", 1), KeyedEvent(1, ts(2000), "b", 2),
      KeyedEvent(1, ts(3000), "c", 3)), spec, strict = false)
    assert(no.isEmpty)
    // B after C is irrelevant (guard closes at the next positive match)
    val after = detectBatch(Seq(
      KeyedEvent(1, ts(1000), "a", 1), KeyedEvent(1, ts(2000), "c", 3),
      KeyedEvent(1, ts(3000), "b", 2)), spec, strict = false)
    assert(after.size == 1)
    // leading/trailing guards are rejected at parse time
    intercept[IllegalArgumentException](MrParser.parse(
      "PATTERN (!A B) DEFINE A AS kind = 'a', B AS kind = 'b'"))
    intercept[IllegalArgumentException](MrParser.parse(
      "PATTERN (A !B) DEFINE A AS kind = 'a', B AS kind = 'b'"))
    intercept[IllegalArgumentException](MrParser.parse(
      "PATTERN (A !B{2} C) DEFINE A AS kind = 'a', B AS kind = 'b'"))
  }

  test("login-fail scenario: three fails then lockout event, SKIP TO NEXT ROW") {
    // CEPDemo times(3)+within: overlapping fail windows are separate
    // matches under SKIP TO NEXT ROW
    val evs = Seq(
      KeyedEvent(9, ts(1000), "fail", 1), KeyedEvent(9, ts(2000), "fail", 2),
      KeyedEvent(9, ts(3000), "fail", 3), KeyedEvent(9, ts(4000), "fail", 4),
      KeyedEvent(9, ts(5000), "lock", 0))
    val out = detectBatch(evs,
      "PATTERN (F{3} L) WITHIN 1 MINUTE AFTER MATCH SKIP TO NEXT ROW " +
      "DEFINE F AS kind = 'fail', L AS kind = 'lock'")
    // strict runs: (1,2,3)+lock impossible (4 intervenes); (2,3,4)+lock OK
    assert(out.map(_.values) == Seq(Seq(2.0, 3.0, 4.0, 0.0)))
    val relaxed = detectBatch(evs,
      "PATTERN (F{3} L) WITHIN 1 MINUTE AFTER MATCH NO SKIP " +
      "DEFINE F AS kind = 'fail', L AS kind = 'lock'",
      strict = false)
    // relaxed: every 3-subset ending before lock completes on the lock,
    // leftmost start wins per start row
    assert(relaxed.nonEmpty && relaxed.head.values.last == 0.0)
  }

  test("negation composes with value conditions") {
    // big transfer not followed by a confirmation before the session end
    val spec = "PATTERN (T !C E) WITHIN 1 HOUR DEFINE " +
      "T AS kind = 'tx' AND value >= 1000, " +
      "C AS kind = 'confirm', E AS kind = 'end'"
    val hit = detectBatch(Seq(
      KeyedEvent(1, ts(1000), "tx", 5000),
      KeyedEvent(1, ts(2000), "tx", 10),   // small tx isn't a guard
      KeyedEvent(1, ts(3000), "end", 0)), spec, strict = false)
    assert(hit.size == 1 && hit.head.values == Seq(5000.0, 0.0))
    val guarded = detectBatch(Seq(
      KeyedEvent(1, ts(1000), "tx", 5000),
      KeyedEvent(1, ts(2000), "confirm", 1),
      KeyedEvent(1, ts(3000), "end", 0)), spec, strict = false)
    assert(guarded.isEmpty)
  }

  test("parsed pattern drives streaming detection; state spans micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val pat = MrParser.parse(
      "PATTERN (A B) WITHIN 10 SECONDS DEFINE A AS kind = 'a', B AS kind = 'b'")
    val input = MemoryStream[KeyedEvent]
    val q = SeqPattern.detect(input.toDS(), pat.steps, pat.withinMs,
        strict = false, pat.skip, pat.greedy)
      .writeStream.format("memory").queryName("mr_stream")
      .outputMode("append").start()
    try {
      input.addData(KeyedEvent(1, ts(1000), "a", 1.0))
      q.processAllAvailable()
      assert(spark.table("mr_stream").count() == 0) // A waiting in state
      input.addData(KeyedEvent(1, ts(2000), "b", 2.0)) // next batch completes
      q.processAllAvailable()
      val rows = spark.table("mr_stream").collect()
      assert(rows.length == 1)
      assert(rows.head.getSeq[Double](3) == Seq(1.0, 2.0))
    } finally q.stop()
  }

  test("sub-millisecond event-time ordering is preserved (µs NFA clock)") {
    def tsUs(us: Long): java.sql.Timestamp = SeqPattern.toTimestamp(us)
    // two events in the same millisecond, order decided by µs
    val evs = Seq(
      KeyedEvent(1, tsUs(1000500), "a", 1), // 1.0005 s
      KeyedEvent(1, tsUs(1000900), "b", 2), // 1.0009 s
      KeyedEvent(1, tsUs(2000000), "c", 3))
    val out = detectBatch(evs,
      "PATTERN (A B C) DEFINE A AS kind = 'a', B AS kind = 'b', C AS kind = 'c'")
    assert(out.size == 1)
    assert(SeqPattern.micros(out.head.startTs) == 1000500L)
    // reversed µs order inside the ms -> sequence broken, no match
    val evs2 = Seq(
      KeyedEvent(1, tsUs(1000900), "a", 1),
      KeyedEvent(1, tsUs(1000500), "b", 2),
      KeyedEvent(1, tsUs(2000000), "c", 3))
    assert(detectBatch(evs2,
      "PATTERN (A B C) DEFINE A AS kind = 'a', B AS kind = 'b', C AS kind = 'c'")
      .isEmpty)
  }

  test("navigation DEFINE: rising run via LAST(A.value,1) with OR/IS NULL") {
    // the reference's up-run pattern (TableSQLFunc.scala:1703-1712):
    // A admits the first row (no previous A) OR a value above the
    // previous A; B requires a drop below the LAST A.
    val evs = Seq(
      KeyedEvent(1, ts(1000), "p", 10), KeyedEvent(1, ts(2000), "p", 12),
      KeyedEvent(1, ts(3000), "p", 15), KeyedEvent(1, ts(4000), "p", 11))
    val out = detectBatch(evs,
      "PATTERN (A+ B) DEFINE " +
      "A AS LAST(A.value, 1) IS NULL OR A.value > LAST(A.value, 1), " +
      "B AS B.value < LAST(A.value)")
    // leftmost-longest under the default SKIP PAST LAST ROW
    assert(out.map(_.values) == Seq(Seq(10.0, 12.0, 15.0, 11.0)))
    assert(out.head.syms == Seq("A", "A", "A", "B"))
  }

  test("navigation DEFINE: cross-variable FIRST offset") {
    // B must exceed the SECOND A row (FIRST(A.value, 1))
    val evs = Seq(
      KeyedEvent(1, ts(1000), "p", 5), KeyedEvent(1, ts(2000), "p", 9),
      KeyedEvent(1, ts(3000), "p", 1), KeyedEvent(1, ts(4000), "p", 10),
      KeyedEvent(2, ts(1000), "p", 5), KeyedEvent(2, ts(2000), "p", 9),
      KeyedEvent(2, ts(3000), "p", 1), KeyedEvent(2, ts(4000), "p", 8))
    val out = detectBatch(evs,
      "PATTERN (A{3} B) DEFINE B AS B.value > FIRST(A.value, 1)")
    // key 1: 10 > 9 matches; key 2: 8 > 9 fails
    assert(out.map(m => (m.key, m.values)) == Seq((1L, Seq(5.0, 9.0, 1.0, 10.0))))
  }

  test("AFTER MATCH SKIP TO FIRST/LAST <var> parses to the new strategies") {
    assert(MrParser.parse(
      "PATTERN (A B) AFTER MATCH SKIP TO LAST A DEFINE A AS TRUE").skip ==
      SkipToLast("A"))
    assert(MrParser.parse(
      "PATTERN (A B) AFTER MATCH SKIP TO FIRST B DEFINE A AS TRUE").skip ==
      SkipToFirst("B"))
    // legacy forms unaffected
    assert(MrParser.parse(
      "PATTERN (A B) AFTER MATCH SKIP TO NEXT ROW DEFINE A AS TRUE").skip ==
      SkipToNext)
  }
}
