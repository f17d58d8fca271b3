package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.SeqPattern._

/** MrSqlParser ↔ MrParser round-trip property (r12 verdict #4): the
  * SQL frontend's statement regex must isolate the `PATTERN … DEFINE …`
  * tail VERBATIM and compile it to the same Step list a direct
  * `MrParser.parse` of that tail produces, for generated combinations
  * of quantifiers (fixed, range, open, plus, star, opt), reluctant markers,
  * negation guards, WITHIN units, all five AFTER MATCH strategies,
  * DEFINE term shapes (kind =/IN, value cmp, AVG, PREV, navigation
  * with OR), MEASURES lists, KIND/MEASURE column overrides and
  * keyword case. Steps carry predicate closures that never compare
  * equal across parses, so equality is asserted over every data field
  * plus closure presence — together with the verbatim-tail check this
  * pins the whole frontend extraction. No SparkSession needed: the
  * property exercises parseSpec, not planning (MrSqlParserSpec covers
  * plan + execution).
  */
class MrSqlRoundTripSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** Structural signature of a compiled pattern. */
  private def sig(c: MrParser.Compiled) =
    (c.steps.map(st => (st.name, st.kinds, st.minValue, st.repeat,
      st.optional, st.negated, st.anyMatch, st.relPred.isDefined,
      st.orPred.isDefined, st.untilPred.isDefined, st.navPred.isDefined)),
      c.withinMs, c.skip, c.greedy)

  // ---- generators ----------------------------------------------------

  private val genSyms: Gen[List[String]] =
    Gen.choose(1, 4).map(n => List("A", "B", "C", "D").take(n))

  /** One pattern element: symbol + optional quantifier + optional
    * reluctant marker, or a bare negation guard (never first/last,
    * never quantified — the parser rejects those loudly). */
  private def genElem(sym: String, canNegate: Boolean): Gen[String] =
    for {
      q <- Gen.oneOf("", "?", "+", "*", "{2}", "{3}", "{1,3}", "{1,4}",
        "{2,}", "{4,}")
      rel <- if (q.nonEmpty) Gen.frequency(3 -> "", 1 -> "?")
             else Gen.const("")
      neg <- if (canNegate && q.isEmpty)
               Gen.frequency(5 -> "", 1 -> "!")
             else Gen.const("")
    } yield if (neg == "!") s"!$sym" else s"$sym$q$rel"

  /** One DEFINE condition over the grammar's term shapes. */
  private def genCondition(sym: String): Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "up").map(k => s"kind = '$k'"),
    Gen.choose(1, 3).map(n =>
      "kind IN (" + (0 until n).map(i => s"'k$i'").mkString(", ") + ")"),
    for {
      op <- Gen.oneOf("<", "<=", ">", ">=", "=")
      v <- Gen.choose(-50, 50)
    } yield s"value $op $v",
    for { op <- Gen.oneOf("<", ">"); v <- Gen.choose(0, 20) }
      yield s"AVG(value) $op $v",
    Gen.oneOf("<", ">").map(op => s"value $op PREV(value)"),
    for {
      k <- Gen.oneOf("x", "y"); op <- Gen.oneOf(">", "<=")
      v <- Gen.choose(0, 9)
    } yield s"kind = '$k' AND value $op $v",
    Gen.const(s"LAST($sym.value,1) IS NULL OR $sym.value > LAST($sym.value,1)"),
    Gen.const("TRUE"))

  private def genDefine(syms: List[String]): Gen[String] =
    for {
      n <- Gen.choose(0, syms.length)
      conds <- Gen.sequence[List[String], String](
        syms.take(n).map(s => genCondition(s).map(c => s"$s AS $c")))
    } yield if (conds.isEmpty) "" else "DEFINE " + conds.mkString(", ")

  private val genWithin: Gen[(String, Long)] = Gen.frequency(
    1 -> Gen.const(("", Long.MaxValue / 4)),
    3 -> (for {
      n <- Gen.choose(1, 999)
      (u, ms) <- Gen.oneOf(("SECOND", 1000L), ("MINUTE", 60000L),
        ("HOUR", 3600000L), ("DAY", 86400000L))
      plural <- Gen.oneOf("", "S")
    } yield (s"WITHIN $n $u$plural", n * ms)))

  private def genSkip(syms: List[String]): Gen[(String, Skip)] = Gen.oneOf(
    Gen.const(("", SkipPastLastRow)),
    Gen.const(("AFTER MATCH SKIP PAST LAST ROW", SkipPastLastRow)),
    Gen.const(("AFTER MATCH SKIP TO NEXT ROW", SkipToNext)),
    Gen.const(("AFTER MATCH NO SKIP", NoSkip)),
    Gen.oneOf(syms).map(v => (s"AFTER MATCH SKIP TO FIRST $v", SkipToFirst(v))),
    Gen.oneOf(syms).map(v => (s"AFTER MATCH SKIP TO LAST $v", SkipToLast(v))))

  /** MEASURES list text + expected column count (None = clause absent,
    * frontend supplies the 2 default measures). */
  private def genMeasures(syms: List[String]): Gen[(String, Int)] =
    Gen.frequency(
      1 -> Gen.const(("", 2)),
      2 -> (for {
        n <- Gen.choose(1, 3)
        items <- Gen.sequence[List[String], String]((1 to n).toList.map(i =>
          for {
            fn <- Gen.oneOf("FIRST", "LAST", "MIN", "MAX", "SUM", "AVG",
              "COUNT")
            q <- Gen.frequency(2 -> Gen.const(""),
              1 -> Gen.oneOf(syms).map(_ + "."))
            arg <- if (fn == "COUNT" && q.isEmpty) Gen.oneOf("value", "*")
                   else Gen.const("value")
            off <- if (fn == "FIRST" || fn == "LAST")
                     Gen.oneOf("", ", 1", ", 2")
                   else Gen.const("")
          } yield s"$fn($q$arg$off) AS m$i"))
      } yield (s"MEASURES ${items.mkString(", ")}", n)))

  private val genStatement = for {
    syms <- genSyms
    elems <- Gen.sequence[List[String], String](syms.zipWithIndex.map {
      case (s, i) => genElem(s, i != 0 && i != syms.length - 1)
    })
    defs <- genDefine(syms)
    (withinTxt, withinMs) <- genWithin
    (skipTxt, skipExp) <- genSkip(syms)
    (measTxt, measN) <- genMeasures(syms)
    kindCol <- Gen.oneOf(None, Some("etype"))
    valCol <- Gen.oneOf(None, Some("amount"))
    lower <- Gen.frequency(3 -> false, 1 -> true)
    sep <- Gen.oneOf(" ", "  ", "\n  ")
  } yield {
    val tail = (s"PATTERN (${elems.mkString(" ")})" +:
      List(withinTxt, skipTxt, defs).filter(_.nonEmpty))
      .mkString(sep)
    // lowercase the whole statement occasionally: every keyword tier
    // (statement regex, PATTERN/DEFINE, WITHIN/AFTER MATCH, AS) must
    // be case-insensitive together — symbols/aliases stay unaffected
    // because the generator only emits uppercase symbol names and the
    // comparison lowers the direct-parse input identically
    val t = if (lower) tail.toLowerCase else tail
    val head = List(
      Some("FROM ev_tbl MATCH_RECOGNIZE ( PARTITION BY user_id ORDER BY ts"),
      kindCol.map("KIND " + _), valCol.map("MEASURE " + _),
      Some(measTxt).filter(_.nonEmpty)).flatten
      .mkString(sep)
    val stmt = (if (lower) head.toLowerCase else head) + sep + t + sep + ")"
    (stmt, t, lower, withinMs, skipExp, measN, kindCol, valCol)
  }

  test("generated MATCH_RECOGNIZE statements: frontend == direct MrParser.parse") {
    checkProp(forAll(genStatement) {
      case (stmt, tail, lower, withinMs, skipExp, measN, kindCol, valCol) =>
        val p = MrSql.parseSpec(stmt).getOrElse(
          sys.error(s"statement did not match the frontend regex:\n$stmt"))
        val direct = MrParser.parse(tail)
        // symbol names survive lowercasing only in step-name form; the
        // expected skip variable must be lowered in lockstep
        val skipAdj = (skipExp, lower) match {
          case (SkipToFirst(v), true) => SkipToFirst(v.toLowerCase)
          case (SkipToLast(v), true) => SkipToLast(v.toLowerCase)
          case (s, _) => s
        }
        assert(p.spec.trim == tail.trim,
          s"pattern tail not isolated verbatim:\n got [${p.spec}]\nwant [$tail]")
        assert(sig(p.compiled) == sig(direct),
          s"frontend-compiled steps diverge from direct parse for:\n$stmt")
        assert(p.compiled.withinMs == withinMs, s"withinMs for:\n$stmt")
        assert(p.compiled.skip == skipAdj, s"skip for:\n$stmt")
        assert(p.table == "ev_tbl" && p.keyCol == "user_id" && p.tsCol == "ts")
        assert(p.kindCol == kindCol.getOrElse("event_type"),
          s"kind column for:\n$stmt")
        assert(p.valCol == valCol.getOrElse("value"),
          s"value column for:\n$stmt")
        assert(p.measures.size == measN, s"measure count for:\n$stmt")
        true
    })
  }

  test("reluctant marker anywhere flips greedy off; absent keeps it on") {
    checkProp(forAll(genStatement) { case (stmt, tail, _, _, _, _, _, _) =>
      val p = MrSql.parseSpec(stmt).get
      val hasReluctant = """[+*}?]\?""".r.findFirstIn(tail).isDefined
      p.compiled.greedy == !hasReluctant
    })
  }
}
