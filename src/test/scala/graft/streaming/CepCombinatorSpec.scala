package graft.streaming

import graft.SparkSpec

/** Batch-mode semantics of the round-5 CEP combinators
  * (CEPDemo.scala:543-949): followedByAny, or-conditions, until,
  * allowCombinations, and the SkipToFirst/SkipToLast after-match
  * strategies. The oracle-checked pat_* queries cover the
  * data-scale behavior; these pin the per-scenario semantics the
  * oracle can't isolate. */
class CepCombinatorSpec extends SparkSpec {

  import SeqPattern._

  private def ev(key: Long, tMs: Long, kind: String, v: Double) =
    KeyedEvent(key, ts(tMs), kind, v)

  private def run(events: Seq[KeyedEvent], steps: Seq[Step],
                  strict: Boolean = false, skip: Skip = NoSkip,
                  withinMs: Long = 1000000L,
                  flushEnd: Boolean = false): Seq[(Long, Long, Seq[Double])] = {
    val s = spark
    import s.implicits._
    SeqPattern.detect(s.createDataset(events), steps, withinMs, strict,
        skip, greedy = true, flushEnd = flushEnd)
      .collect().toSeq
      .map(m => (m.startTs.getTime, m.endTs.getTime, m.values))
      .sortBy(x => (x._1, x._2))
  }

  // ---- followedByAny (CEPDemo.scala:685-714) --------------------------

  private val anyEvents = Seq(
    ev(1, 1000, "s1", 1), ev(1, 2000, "s2", 2), ev(1, 3000, "s1", 3),
    ev(1, 4000, "s1", 4), ev(1, 5000, "s2", 5))

  test("followedBy pairs each start with only the FIRST later hit") {
    val steps = Seq(Step("a", Set("s1")), Step("b", Set("s2")))
    val out = run(anyEvents, steps)
    assert(out.map(x => (x._1, x._2)) ==
      Seq((1000L, 2000L), (3000L, 5000L), (4000L, 5000L)))
  }

  test("followedByAny pairs each start with EVERY later hit") {
    val steps = Seq(Step("a", Set("s1")), Step("b", Set("s2")).any)
    val out = run(anyEvents, steps)
    assert(out.map(x => (x._1, x._2)) ==
      Seq((1000L, 2000L), (1000L, 5000L), (3000L, 5000L), (4000L, 5000L)))
  }

  // ---- or-condition (CEP .where(c1).or(c2)) ---------------------------

  test("or-condition admits either disjunct; strict next still enforced") {
    val steps = Seq(
      Step("a", Set("aa")).or(e => e.value >= 10.0),
      Step("b", Set("bb")))
    val events = Seq(
      ev(1, 1000, "aa", 1),  // matches a (kind) but next is cc → dies
      ev(1, 2000, "cc", 15), // matches a (value>=10)
      ev(1, 3000, "bb", 0),  // completes with the cc start
      ev(1, 4000, "aa", 1))  // no b after → nothing
    val out = run(events, steps, strict = true)
    assert(out.map(x => (x._1, x._2)) == Seq((2000L, 3000L)))
  }

  // ---- until loop-stop (CEP oneOrMore().until) ------------------------

  test("until stops the view loop at the first purchase, permanently") {
    val steps =
      Seq(Step("S", Set("s"))) ++
      Step("V", Set("v")).until(_.kind == "p").upTo(8) ++
      Seq(Step("P", Set("p")))
    val events = Seq(
      ev(1, 1000, "s", 1), ev(1, 2000, "v", 2), ev(1, 3000, "v", 3),
      ev(1, 4000, "p", 4), ev(1, 5000, "v", 5), ev(1, 6000, "p", 6))
    val out = run(events, steps)
    // one match: signup + both pre-purchase views + FIRST purchase;
    // the stale prefix must NOT re-complete with the second purchase
    assert(out == Seq((1000L, 4000L, Seq(1.0, 2.0, 3.0, 4.0))))
  }

  test("until kills the run even when the stop event completes nothing") {
    // P additionally requires value >= 10, so the first purchase (v=4)
    // completes nothing. until still fires on it: the run dies and the
    // second purchase finds no partial. WITHOUT until the run survives,
    // keeps looping views, and completes at the second purchase.
    val events = Seq(
      ev(1, 1000, "s", 1), ev(1, 2000, "v", 2), ev(1, 3000, "v", 3),
      ev(1, 4000, "p", 4), ev(1, 5000, "v", 5), ev(1, 6000, "p", 12))
    def steps(withUntil: Boolean) = {
      val loop =
        if (withUntil) Step("V", Set("v")).until(_.kind == "p").upTo(8)
        else Step("V", Set("v")).upTo(8)
      Seq(Step("S", Set("s"))) ++ loop ++
        Seq(Step("P", Set("p"), minValue = 10.0))
    }
    assert(run(events, steps(withUntil = true)).isEmpty,
      "until must kill the run at the first purchase")
    assert(run(events, steps(withUntil = false)) ==
      Seq((1000L, 6000L, Seq(1.0, 2.0, 3.0, 5.0, 12.0))),
      "without until the loop crosses the first purchase")
  }

  // ---- allowCombinations (CEPDemo.scala:211-247) ----------------------

  test("combinations branch lets the loop skip a matching event") {
    // C requires the loop's (single) element to be the SECOND b; a
    // plain loop is forced to consume the first b and can never match.
    val loopAny = Step("B", Set("b")).combinationsUpTo(1)
    val loopPlain = Step("B", Set("b")).upTo(1)
    val tail = Step("C", Set("c")).where((_, prefix) => prefix.last == 9.0)
    val events = Seq(
      ev(1, 1000, "a", 1), ev(1, 2000, "b", 6),
      ev(1, 3000, "b", 9), ev(1, 4000, "c", 0))
    val head = Step("A", Set("a"))
    assert(run(events, head +: (loopPlain :+ tail)).isEmpty,
      "plain loop must be locked to the first b")
    val out = run(events, head +: (loopAny :+ tail))
    assert(out == Seq((1000L, 4000L, Seq(1.0, 9.0, 0.0))),
      s"combinations loop should carry the second b: $out")
  }

  // ---- SkipToFirst / SkipToLast (CEPDemo.scala:872-948) ---------------

  private val skipEvents = Seq(
    ev(1, 1000, "a", 1), ev(1, 2000, "b", 2), ev(1, 3000, "a", 3),
    ev(1, 4000, "c", 4), ev(1, 5000, "b", 5), ev(1, 6000, "c", 6))
  private val abc = Seq(
    Step("A", Set("a")), Step("B", Set("b")), Step("C", Set("c")))

  test("NoSkip keeps the in-flight run across a completion") {
    val out = run(skipEvents, abc)
    assert(out.map(x => (x._1, x._2)) == Seq((1000L, 4000L), (3000L, 6000L)))
  }

  test("SkipPastLastRow clears in-flight runs on completion") {
    val out = run(skipEvents, abc, skip = SkipPastLastRow)
    assert(out.map(x => (x._1, x._2)) == Seq((1000L, 4000L)))
  }

  test("SkipToFirst(B) keeps runs starting at/after B's first row") {
    // anchor = 2000 (B of the completed match); the 3000-start survives
    val out = run(skipEvents, abc, skip = SkipToFirst("B"))
    assert(out.map(x => (x._1, x._2)) == Seq((1000L, 4000L), (3000L, 6000L)))
  }

  test("SkipToLast(C) drops runs starting before C's row") {
    // anchor = 4000; the 3000-start is pruned → no second match
    val out = run(skipEvents, abc, skip = SkipToLast("C"))
    assert(out.map(x => (x._1, x._2)) == Seq((1000L, 4000L)))
  }
}
