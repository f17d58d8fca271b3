package graft.streaming

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SeqPattern._

/** Property tests: the NFA against BRUTE-FORCE reference matchers on
  * random event sequences. The example-based specs (CepCombinatorSpec,
  * OrderedCepSpec) pin the reference scenarios; these pin the closed-
  * form semantics each combinator is supposed to have, on inputs no
  * example list would think of:
  *   - followedByAny => ALL increasing subsequences (within horizon)
  *   - plain followedBy => first-hit chains, one per start
  *   - next (strict) => adjacent runs only
  *   - .or(c) == widening the kind set (condition-algebra law)
  *   - SkipPastLastRow == the non-overlapping left-to-right scan
  * Events get distinct timestamps and values, so a match is identified
  * by its value list and set-equality is exact.
  */
class CepPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  /** Random kind sequence over {A, B, C, N}; event i at (i+1) seconds
    * with value i — strictly increasing, collision-free. */
  private val genEvents: Gen[List[KeyedEvent]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("A", "B", "C", "N")).map(_.zipWithIndex.map {
        case (k, i) => KeyedEvent(1L, new Timestamp((i + 1) * 1000L), k, i.toDouble)
      }))
  private val genWithin: Gen[Long] = Gen.oneOf(4000L, 9000L, 1000000L)

  private def ts(e: KeyedEvent): Long = e.ts.getTime
  private def got(ms: Seq[MatchOut]): Set[List[Double]] =
    ms.map(_.values.toList).toSet

  test("followedByAny emits every increasing subsequence inside the horizon") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).any)
      val expect = (for {
        a <- es if a.kind == "A"
        b <- es if b.kind == "B" && ts(b) > ts(a) && ts(b) - ts(a) <= w
      } yield List(a.value, b.value)).toSet
      got(runPure(es, steps, w, strict = false, NoSkip)) == expect
    })
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Seq(Step("a", Set("A")),
        Step("b", Set("B")).any, Step("c", Set("C")).any)
      val expect = (for {
        a <- es if a.kind == "A"
        b <- es if b.kind == "B" && ts(b) > ts(a)
        c <- es if c.kind == "C" && ts(c) > ts(b) && ts(c) - ts(a) <= w
      } yield List(a.value, b.value, c.value)).toSet
      got(runPure(es, steps, w, strict = false, NoSkip)) == expect
    })
  }

  test("plain followedBy takes the first hit per step, one match per start") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")), Step("c", Set("C")))
      val expect = (for {
        a <- es if a.kind == "A"
        b <- es.find(e => e.kind == "B" && ts(e) > ts(a)).toList
        if ts(b) - ts(a) <= w // partial expired before b otherwise
        c <- es.find(e => e.kind == "C" && ts(e) > ts(b)).toList
        if ts(c) - ts(a) <= w
      } yield List(a.value, b.value, c.value)).toSet
      got(runPure(es, steps, w, strict = false, NoSkip)) == expect
    })
  }

  test("next (strict contiguity) matches adjacent runs only") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")))
      val expect = es.zip(es.drop(1)).collect {
        case (a, b) if a.kind == "A" && b.kind == "B" && ts(b) - ts(a) <= w =>
          List(a.value, b.value)
      }.toSet
      got(runPure(es, steps, w, strict = true, NoSkip)) == expect
    })
  }

  test(".or(pred) is exactly kind-set widening") {
    checkProp(forAll(genEvents, genWithin, Gen.oneOf(true, false)) { (es, w, strict) =>
      val withOr = Seq(Step("a", Set("A")),
        Step("b", Set("B")).or(e => e.kind == "C"))
      val widened = Seq(Step("a", Set("A")), Step("b", Set("B", "C")))
      runPure(es, withOr, w, strict, NoSkip) ==
        runPure(es, widened, w, strict, NoSkip)
    })
  }

  test("negated guard kills exactly the runs with an intervening guard hit") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      // A (!N) B: first B after each A completes it UNLESS an N
      // arrived strictly between them
      val steps = Seq(Step("a", Set("A")), Step("g", Set("N")).not,
        Step("b", Set("B")))
      val expect = (for {
        a <- es if a.kind == "A"
        b <- es.find(e => e.kind == "B" && ts(e) > ts(a)).toList
        if ts(b) - ts(a) <= w
        if !es.exists(n => n.kind == "N" && ts(n) > ts(a) && ts(n) < ts(b))
      } yield List(a.value, b.value)).toSet
      got(runPure(es, steps, w, strict = false, NoSkip)) == expect
    })
  }

  test("WITHIN expiry emits every equal-length distinct-row combination, " +
    "not one arbitrary pick") {
    // A then B-combinations (anyMatch, up to 2) with a 5s horizon:
    // [A,B1,B2] completes at B2 (greedy max extent); [A,B1] and [A,B2]
    // stay accepting-but-extendable until the horizon passes. They are
    // DISTINCT combination matches (different middle rows), so expiry
    // must emit both — collapsing the start group to maxBy dropped one.
    val es = List(
      KeyedEvent(1L, new Timestamp(1000L), "A", 0.0),
      KeyedEvent(1L, new Timestamp(2000L), "B", 1.0),
      KeyedEvent(1L, new Timestamp(3000L), "B", 2.0),
      KeyedEvent(1L, new Timestamp(20000L), "N", 3.0))
    val steps = Step("a", Set("A")) +: Step("b", Set("B")).combinationsUpTo(2)
    val out = got(runPure(es, steps, 5000L, strict = false, NoSkip))
    assert(out === Set(List(0.0, 1.0), List(0.0, 2.0), List(0.0, 1.0, 2.0)))
  }

  test("end-of-input flush emits every equal-length distinct-row combination") {
    // same shape, but the horizon never passes — the flush path must
    // apply the same all-at-winning-length pick rule
    val es = List(
      KeyedEvent(1L, new Timestamp(1000L), "A", 0.0),
      KeyedEvent(1L, new Timestamp(2000L), "B", 1.0),
      KeyedEvent(1L, new Timestamp(3000L), "B", 2.0))
    val steps = Step("a", Set("A")) +: Step("b", Set("B")).combinationsUpTo(2)
    val out = got(runPure(es, steps, 1000000L, strict = false, NoSkip,
      flushEnd = true))
    assert(out === Set(List(0.0, 1.0), List(0.0, 2.0), List(0.0, 1.0, 2.0)))
  }

  test("greedy optional takes the longest extent available at completion") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      // A B? C: completion happens at the first C; the B branch wins
      // when a B arrived in between (longest extent), else A-C
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).opt,
        Step("c", Set("C")))
      val expect = (for {
        a <- es if a.kind == "A"
        c <- es.find(e => e.kind == "C" && ts(e) > ts(a)).toList
        if ts(c) - ts(a) <= w
      } yield {
        val b = es.find(e => e.kind == "B" && ts(e) > ts(a) && ts(e) < ts(c))
        b.map(bb => List(a.value, bb.value, c.value))
          .getOrElse(List(a.value, c.value))
      }).toSet
      got(runPure(es, steps, w, strict = false, NoSkip)) == expect
    })
  }

  test("reluctant zero-or-more takes the shortest run to the FIRST completion") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      // A B*? C with wildcard B, strict contiguity, NO SKIP: each A
      // start matches the contiguous run to its FIRST following C
      // (within the horizon and the MaxRepeat=8 bounded expansion) —
      // and ONLY that run: completion kills same-start longer branches
      val steps = (Step("a", Set("A")) +:
        Step("b", Set.empty[String]).zeroUpTo(8)) :+ Step("c", Set("C"))
      val idx = es.zipWithIndex
      val expect = (for {
        (a, i) <- idx if a.kind == "A"
        (c, j) <- idx.find { case (e, k) => e.kind == "C" && k > i }.toList
        if j - i - 1 <= 8 && ts(c) - ts(a) <= w
      } yield es.slice(i, j + 1).map(_.value)).toSet
      got(runPure(es, steps, w, strict = true, NoSkip, greedy = false)) == expect
    })
  }

  // ---- quantifier × skip-strategy × within interactions ----
  // A reference machine for PLAIN KIND CHAINS (no anyMatch/optional):
  // relaxed contiguity, greedy, first-hit advancement — but with the
  // completion + AFTER MATCH skip semantics of all five strategies
  // implemented independently of the NFA. Quantifiers enter as
  // repeated chain positions (times(n)/group expand to exactly that),
  // so these properties cross the three axes the example specs never
  // mix: bounded repetition, every skip strategy, and horizon expiry.
  private def chainScan(es: List[KeyedEvent], names: List[String],
      kinds: List[String], w: Long, skip: Skip,
      strict: Boolean = false): Set[List[Double]] =
    ChainModel.chainScan(es, names, kinds, w, skip, strict)

  private val genSkipB: Gen[Skip] = Gen.oneOf(NoSkip, SkipToNext,
    SkipPastLastRow, SkipToFirst("b"), SkipToLast("b"))

  test("quantified A B{2} matches the reference under every skip strategy") {
    checkProp(forAll(genEvents, genWithin, genSkipB) { (es, w, sk) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).times(2))
      got(runPure(es, steps, w, strict = false, sk)) ==
        chainScan(es, List("a", "b", "b"), List("A", "B", "B"), w, sk)
    })
  }

  test("3-step chain A B C matches the reference under every skip strategy") {
    checkProp(forAll(genEvents, genWithin, genSkipB) { (es, w, sk) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")),
        Step("c", Set("C")))
      got(runPure(es, steps, w, strict = false, sk)) ==
        chainScan(es, List("a", "b", "c"), List("A", "B", "C"), w, sk)
    })
  }

  test("pattern group (A B){2} matches the reference under every skip strategy") {
    checkProp(forAll(genEvents, genWithin, genSkipB) { (es, w, sk) =>
      val steps = group(Seq(Step("a", Set("A")), Step("b", Set("B"))), 2)
      got(runPure(es, steps, w, strict = false, sk)) ==
        chainScan(es, List("a", "b", "a", "b"), List("A", "B", "A", "B"), w, sk)
    })
  }

  test("STRICT chains match the reference under every skip strategy") {
    // strict contiguity (`next`) crossed with quantifiers and all five
    // skip strategies: a non-matching event kills the partial instead
    // of being skipped over
    checkProp(forAll(genEvents, genWithin, genSkipB) { (es, w, sk) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).times(2))
      got(runPure(es, steps, w, strict = true, sk)) ==
        chainScan(es, List("a", "b", "b"), List("A", "B", "B"), w, sk,
          strict = true)
    })
    checkProp(forAll(genEvents, genWithin, genSkipB) { (es, w, sk) =>
      val steps = group(Seq(Step("a", Set("A")), Step("b", Set("B"))), 2)
      got(runPure(es, steps, w, strict = true, sk)) ==
        chainScan(es, List("a", "b", "a", "b"), List("A", "B", "A", "B"), w,
          sk, strict = true)
    })
  }

  test("allowCombinations × within: every 1- and 2-subset inside the horizon") {
    // generalizes the two example tests above to random sequences AND
    // finite horizons: size-2 subsets emit at completion, size-1
    // subsets at horizon expiry (or end-of-input flush), so the full
    // expected set is exactly the in-horizon B-subsequences of size <=2
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Step("a", Set("A")) +: Step("b", Set("B")).combinationsUpTo(2)
      val singles = (for {
        a <- es if a.kind == "A"
        b <- es if b.kind == "B" && ts(b) > ts(a) && ts(b) - ts(a) <= w
      } yield List(a.value, b.value)).toSet
      val pairs = (for {
        a <- es if a.kind == "A"
        b1 <- es if b1.kind == "B" && ts(b1) > ts(a)
        b2 <- es if b2.kind == "B" && ts(b2) > ts(b1) && ts(b2) - ts(a) <= w
      } yield List(a.value, b1.value, b2.value)).toSet
      got(runPure(es, steps, w, strict = false, NoSkip, flushEnd = true)) ==
        (singles ++ pairs)
    })
  }

  test("SkipPastLastRow is the non-overlapping left-to-right scan") {
    checkProp(forAll(genEvents, genWithin) { (es, w) =>
      val steps = Seq(Step("a", Set("A")), Step("b", Set("B")))
      // reference scan: open starts accumulate, expire, and the first
      // B closes the LEFTMOST open start and clears the rest
      var open = List.empty[KeyedEvent]
      val expect = scala.collection.mutable.Set.empty[List[Double]]
      es.foreach { e =>
        open = open.filter(a => ts(e) - ts(a) <= w)
        if (e.kind == "B" && open.nonEmpty) {
          expect += List(open.minBy(ts).value, e.value)
          open = Nil
        }
        if (e.kind == "A") open ::= e
      }
      got(runPure(es, steps, w, strict = false, SkipPastLastRow)) == expect.toSet
    })
  }

  // ---- state-bound flood gates (r13 verdict #2) -------------------
  // The scaladoc claims the live-partial set is bounded by horizon
  // DENSITY (events inside the WITHIN window), independent of stream
  // length — with one extra density factor per anyMatch step. These
  // floods push one key far past the horizon and assert the ceiling
  // on SeqPattern.maxLivePartials, the actual per-key state size.

  private def flood(n: Int)(kind: Int => String): Seq[KeyedEvent] =
    (0 until n).map(i =>
      KeyedEvent(1L, new Timestamp((i + 1) * 1000L), kind(i), i.toDouble))

  test("flood: deterministic steps hold O(horizon density) partials") {
    // 6000 starts, horizon holds 300 — a linear-in-stream NFA would
    // reach ~6000 live partials; the horizon prune caps it at ~301
    val steps = Seq(Step("a", Set("A")), Step("b", Set("B")),
      Step("c", Set("C")))
    val mx = maxLivePartials(flood(6000)(_ => "A"), steps,
      withinMs = 300000L, strict = false, NoSkip)
    assert(mx <= 310, s"deterministic flood ceiling breached: $mx > 310")
    assert(mx >= 290, s"flood did not fill the horizon: $mx — test rotten")
  }

  test("flood: one followedByAny step holds O(density^2), not exponential") {
    // anchors (A) every 100 s, B flood between them, WITHIN 200 s:
    // <= 3 live anchors x <= 200 branch partials each (one per B the
    // anchor has seen — followedByAny keeps every branch by design,
    // CepPropertySpec's subsequence law above) + the anchors
    // themselves: ceiling ~603 across a 5000-event stream.
    val steps = Seq(Step("a", Set("A")), Step("b", Set("B")).any,
      Step("c", Set("C")))
    val mx = maxLivePartials(flood(5000)(i => if (i % 100 == 0) "A" else "B"),
      steps, withinMs = 200000L, strict = false, NoSkip)
    assert(mx <= 700, s"followedByAny flood ceiling breached: $mx > 700")
    assert(mx >= 250, s"flood did not exercise branch-keeping: $mx")
  }

  test("flood: allowCombinations holds O(density^2) and is stream-length independent") {
    // combinationsUpTo(2) legitimately tracks every in-horizon PAIR
    // (its match set IS all combinations); with WITHIN holding ~50
    // events the pair count is ~50*50/2 + 50 singles ~ 1300. A prune
    // failure would track all C(400,2) = 79800 pairs.
    val steps = Step("a", Set("A")).combinationsUpTo(2) :+
      Step("d", Set("D"))
    val mx = maxLivePartials(flood(400)(_ => "A"), steps,
      withinMs = 50000L, strict = false, NoSkip)
    assert(mx <= 2000, s"allowCombinations flood ceiling breached: $mx > 2000")
    assert(mx >= 600, s"flood did not build combinatorial pairs: $mx")
  }
}
