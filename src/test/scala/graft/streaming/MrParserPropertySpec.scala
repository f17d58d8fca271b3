package graft.streaming

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SeqPattern._

/** MATCH_RECOGNIZE text fuzz: random pattern/WITHIN/AFTER MATCH/DEFINE
  * clauses rendered to SQL-ish text, parsed by MrParser, executed by
  * the NFA, and compared against ChainModel's independent reference —
  * so the parser's quantifier expansion, horizon-unit conversion, and
  * skip-clause mapping are checked END TO END, not just structurally.
  * Restricted to fixed {n} quantifiers (plain chains, the class the
  * model covers); the optional/any surface is property-tested at the
  * combinator layer (CepPropertySpec). */
class MrParserPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(120), p)
    assert(res.passed, res.status.toString)
  }

  private val genEvents: Gen[List[KeyedEvent]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("A", "B", "C", "N")).map(_.zipWithIndex.map {
        case (k, i) => KeyedEvent(1L, new Timestamp((i + 1) * 1000L), k, i.toDouble)
      }))

  /** (symbol, repeat) tokens: symbols may REPEAT across tokens (SKIP TO
    * FIRST/LAST then anchors on a multi-row variable). */
  private val genTokens: Gen[List[(String, Int)]] =
    Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, for {
        s <- Gen.oneOf("A", "B", "C")
        r <- Gen.choose(1, 3)
      } yield (s, r)))

  private val genWithinSec: Gen[Int] = Gen.oneOf(4, 9, 1000)

  private def genSkipClause(syms: Seq[String]): Gen[(String, Skip)] =
    Gen.oneOf(
      Gen.const(("AFTER MATCH SKIP PAST LAST ROW", SkipPastLastRow)),
      Gen.const(("AFTER MATCH SKIP TO NEXT ROW", SkipToNext)),
      Gen.const(("", SkipPastLastRow)), // absent clause -> default
      Gen.oneOf(syms).map(v => (s"AFTER MATCH SKIP TO FIRST $v", SkipToFirst(v))),
      Gen.oneOf(syms).map(v => (s"AFTER MATCH SKIP TO LAST $v", SkipToLast(v))))

  test("random pattern text: parse -> NFA == chain reference, both contiguities") {
    val gen = for {
      toks <- genTokens
      wSec <- genWithinSec
      skip <- genSkipClause(toks.map(_._1).distinct)
      es   <- genEvents
      strict <- Gen.oneOf(true, false)
    } yield (toks, wSec, skip, es, strict)
    checkProp(forAll(gen) { case (toks, wSec, (skipTxt, skipExp), es, strict) =>
      val pat = toks.map { case (s, r) =>
        if (r == 1) s else s"$s{$r}" }.mkString(" ")
      val defs = toks.map(_._1).distinct
        .map(s => s"$s AS kind = '$s'").mkString(", ")
      val text = s"PATTERN ($pat) WITHIN $wSec SECONDS $skipTxt DEFINE $defs"
      val c = MrParser.parse(text)
      val names = toks.flatMap { case (s, r) => List.fill(r)(s) }
      val kinds = names // DEFINE maps each symbol to its own kind
      c.skip == skipExp && c.withinMs == wSec * 1000L && c.greedy &&
        (runPure(es, c.steps, c.withinMs, strict, c.skip)
          .map(_.values.toList).toSet ==
         ChainModel.chainScan(es, names, kinds, c.withinMs, c.skip, strict))
    })
  }
}
