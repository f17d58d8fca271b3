package graft.streaming

import graft.streaming.SeqPattern._

/** MATCH_RECOGNIZE text frontend: compiles the reference's
  * `PATTERN (...) [WITHIN ...] [AFTER MATCH ...] DEFINE ...` surface
  * (TableSQLFunc.scala:1569-2240 — 8 scenarios) into `SeqPattern`
  * steps, so the same pattern text drives both the batch detector
  * (flatMapGroupsWithState over a batch Dataset) and the streaming one.
  *
  * Grammar (covers every construct the reference's scenarios use):
  *
  * {{{
  * spec       := PATTERN '(' elem+ ')' within? afterMatch? DEFINE defs
  * elem       := SYMBOL quant? reluctant?
  * quant      := '{' n '}' | '{' 1 ',' n '}' | '+' | '?'
  * reluctant  := '?'                      // e.g. B{1,3}? / B+?
  * within     := WITHIN n (SECOND|MINUTE|HOUR|DAY)[S]
  * afterMatch := AFTER MATCH (SKIP PAST LAST ROW|SKIP TO NEXT ROW|NO SKIP)
  * defs       := SYMBOL AS cond (',' SYMBOL AS cond)*
  * cond       := term (AND term)*
  * term       := TRUE
  *             | kind '=' 'lit' | kind IN '(' 'lit' (',' 'lit')* ')'
  *             | value cmp num  | AVG '(' value ')' cmp num
  *             | value cmp PREV '(' value ')'
  * cmp        := '<' | '<=' | '>' | '>=' | '='
  * }}}
  *
  * Semantics notes (matching the reference's MATCH_RECOGNIZE):
  *   - a SYMBOL with no DEFINE clause matches any row (wildcard);
  *   - `AVG(value)` aggregates the rows matched so far INCLUDING the
  *     candidate row (iterative DEFINE condition);
  *   - `PREV(value)` is the immediately preceding matched row's value;
  *     a row with no predecessor fails the condition (SQL NULL->false);
  *   - `+` (unbounded oneOrMore) expands to a bounded 1..MaxRepeat NFA
  *     — bounded expansion keeps per-key state finite, the same
  *     trade the CEP library makes with timesOrMore + within;
  *   - any reluctant marker switches the whole match selection to
  *     shortest-match (`greedy = false` in SeqPattern.detect).
  */
object MrParser {

  /** Bounded expansion cap for the unbounded `+` quantifier. */
  val MaxRepeat = 8

  case class Compiled(steps: Seq[Step], withinMs: Long, skip: Skip,
                      greedy: Boolean)

  private val PatternRe = """(?s)PATTERN\s*\(([^)]*)\)""".r
  private val WithinRe = """WITHIN\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?""".r
  private val SkipRe =
    """AFTER\s+MATCH\s+(SKIP\s+PAST\s+LAST\s+ROW|SKIP\s+TO\s+NEXT\s+ROW|NO\s+SKIP)""".r
  private val DefineRe = """(?s)DEFINE\s+(.*)$""".r
  private val ElemRe =
    """(!?)([A-Za-z_][A-Za-z0-9_]*)(\{(\d+)(,(\d+))?\}|\+|\?)?(\?)?""".r

  def parse(spec: String): Compiled = {
    val s = spec.trim.replaceAll("\\s+", " ")

    val patternBody = PatternRe.findFirstMatchIn(s)
      .getOrElse(fail("missing PATTERN (...)", s)).group(1).trim
    val withinMs = WithinRe.findFirstMatchIn(s).map { m =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "SECOND" => n * 1000L
        case "MINUTE" => n * 60000L
        case "HOUR"   => n * 3600000L
        case "DAY"    => n * 86400000L
      }
    }.getOrElse(Long.MaxValue / 4) // unbounded horizon
    val skip = SkipRe.findFirstMatchIn(s)
      .map(_.group(1).replaceAll("\\s+", " ")).getOrElse("SKIP PAST LAST ROW") match {
      case "SKIP PAST LAST ROW" => SkipPastLastRow
      case "SKIP TO NEXT ROW"   => SkipToNext
      case "NO SKIP"            => NoSkip
    }
    val defs: Map[String, Step => Step] =
      DefineRe.findFirstMatchIn(s) match {
        case None => Map.empty // every symbol a wildcard
        case Some(m) =>
          // split on commas that start a new `SYM AS` clause (commas
          // inside IN (...) lists don't match the lookahead)
          m.group(1).split(""",\s*(?=[A-Za-z_][A-Za-z0-9_]*\s+AS\s)""")
            .map(parseDefine).toMap
      }

    var greedy = true
    val steps = patternBody.split("\\s+").toSeq.flatMap { tok =>
      val m = ElemRe.pattern.matcher(tok)
      if (!m.matches()) fail(s"bad pattern element '$tok'", s)
      val negated = m.group(1) == "!"
      val name = m.group(2)
      if (m.group(7) != null) greedy = false
      val base0 = defs.getOrElse(name, identity[Step] _)(
        Step(name, kinds = Set.empty))
      val base = if (negated) base0.not else base0
      if (negated && m.group(3) != null)
        fail(s"negative guard cannot carry a quantifier: '$tok'", s)
      m.group(3) match {
        case null => Seq(base)
        case "?"  => Seq(base.opt)
        case "+"  => base.upTo(MaxRepeat)
        case _ if m.group(6) != null => // {1,n} (lower bound must be 1)
          if (m.group(4).toInt != 1) fail(s"only {1,n} ranges supported: '$tok'", s)
          base.upTo(m.group(6).toInt)
        case _ => Seq(base.times(m.group(4).toInt)) // {n}
      }
    }
    if (steps.nonEmpty && (steps.head.negated || steps.last.negated))
      fail("a negative guard (!SYM) cannot lead or end the pattern", s)
    Compiled(steps, withinMs, skip, greedy)
  }

  // ---- DEFINE clause → Step transformer -----------------------------

  private val KindEqRe = """(?i)kind\s*=\s*'([^']*)'""".r
  private val KindInRe = """(?i)kind\s+IN\s*\(([^)]*)\)""".r
  private val ValCmpRe = """(?i)value\s*(<=|>=|<|>|=)\s*(-?[0-9.]+(?:[eE]-?\d+)?)""".r
  private val AvgCmpRe = """(?i)AVG\s*\(\s*value\s*\)\s*(<=|>=|<|>|=)\s*(-?[0-9.]+(?:[eE]-?\d+)?)""".r
  private val PrevCmpRe = """(?i)value\s*(<=|>=|<|>|=)\s*PREV\s*\(\s*value\s*\)""".r

  private def cmp(op: String): (Double, Double) => Boolean = op match {
    case "<" => _ < _
    case "<=" => _ <= _
    case ">" => _ > _
    case ">=" => _ >= _
    case "=" => _ == _
  }

  /** AND-compose a new iterative predicate onto a step (Step.where
    * alone would REPLACE an existing relPred, silently dropping
    * earlier terms of a multi-term DEFINE condition). */
  private def addPred(st: Step,
                      p: (Double, Seq[Double]) => Boolean): Step =
    st.copy(relPred = Some(st.relPred match {
      case Some(q) => (v, pre) => q(v, pre) && p(v, pre)
      case None    => p
    }))

  private def parseDefine(clause: String): (String, Step => Step) = {
    val parts = clause.trim.split("""(?i)\s+AS\s+""", 2)
    if (parts.length != 2) fail("DEFINE clause needs 'SYM AS cond'", clause)
    val sym = parts(0).trim
    val terms = parts(1).split("""(?i)\s+AND\s+""").map(_.trim)
    val xform = terms.foldLeft(identity[Step] _) { (acc, term) =>
      val f: Step => Step = term match {
        case t if t.equalsIgnoreCase("TRUE") => identity
        case KindEqRe(lit) => st => st.copy(kinds = st.kinds + lit)
        case KindInRe(list) =>
          val lits = """'([^']*)'""".r.findAllMatchIn(list).map(_.group(1)).toSet
          st => st.copy(kinds = st.kinds ++ lits)
        case PrevCmpRe(op) => // ordered before ValCmpRe: both start `value cmp`
          val c = cmp(op)
          st => addPred(st, (v, prefix) => prefix.lastOption.exists(p => c(v, p)))
        case AvgCmpRe(op, num) =>
          val c = cmp(op); val n = num.toDouble
          st => addPred(st, (v, prefix) => {
            val xs = prefix :+ v
            c(xs.sum / xs.length, n)
          })
        case ValCmpRe(op, num) =>
          val c = cmp(op); val n = num.toDouble
          st => addPred(st, (v, _) => c(v, n))
        case other => fail(s"unsupported DEFINE term '$other'", clause)
      }
      acc.andThen(f)
    }
    sym -> xform
  }

  private def fail(msg: String, ctx: String): Nothing =
    throw new IllegalArgumentException(s"MATCH_RECOGNIZE parse error: $msg in: $ctx")
}
