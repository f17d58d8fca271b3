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
  * quant      := '{' n '}' | '{' 1 ',' n '}' | '{' n ',' '}' | '+' | '?' | '*'
  * reluctant  := '?'                      // e.g. B{1,3}? / B+? / B*?
  * within     := WITHIN n (SECOND|MINUTE|HOUR|DAY)[S]
  * afterMatch := AFTER MATCH (SKIP PAST LAST ROW|SKIP TO NEXT ROW|NO SKIP
  *                            |SKIP TO (FIRST|LAST) SYMBOL)
  * defs       := SYMBOL AS cond (',' SYMBOL AS cond)*
  * cond       := disj (OR disj)*          // OR at paren depth 0
  * disj       := '('? term (AND term)* ')'?
  * term       := TRUE
  *             | kind '=' 'lit' | kind IN '(' 'lit' (',' 'lit')* ')'
  *             | value cmp num  | AVG '(' value ')' cmp num
  *             | value cmp PREV '(' value ')'
  *             | operand cmp operand      // navigation comparisons
  *             | nav IS [NOT] NULL
  * operand    := nav | SYMBOL '.' value | value | num
  * nav        := (FIRST|LAST) '(' SYMBOL '.' value [',' n] ')'
  * cmp        := '<' | '<=' | '>' | '>=' | '='
  * }}}
  *
  * Navigation semantics (TableSQLFunc.scala:1622-1712): inside the
  * DEFINE of A, the candidate row tentatively belongs to A, so
  * `LAST(A.value, 1)` is the previous A row; a reference to another
  * symbol B is `LAST(B.value, 0)` over the rows matched so far; an
  * out-of-range navigation is SQL NULL (comparisons false, testable
  * with IS [NOT] NULL). A condition containing OR or navigation
  * compiles to one closure over the symbol-tagged prefix
  * (Step.navPred); plain conjunctions keep the legacy compilation.
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

  // keyword matching is case-insensitive END TO END: the SQL statement
  // regex (MrSql.Re) is (?i), so `pattern (...) define ...` reaches
  // this parser — PATTERN/DEFINE and the clause-split AS lookahead
  // must accept it too (found by MrSqlRoundTripSpec's case fuzz, r13;
  // WITHIN/AFTER MATCH/AS were already (?i))
  private val PatternRe = """(?is)PATTERN\s*\(([^)]*)\)""".r
  private val WithinRe = """(?i)WITHIN\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\b""".r
  private val SkipRe =
    """(?i)AFTER\s+MATCH\s+(SKIP\s+PAST\s+LAST\s+ROW|SKIP\s+TO\s+NEXT\s+ROW|NO\s+SKIP)""".r
  private val SkipToVarRe =
    """(?i)AFTER\s+MATCH\s+SKIP\s+TO\s+(FIRST|LAST)\s+(\w+)""".r
  private val DefineRe = """(?is)DEFINE\s+(.*)$""".r
  private val ElemRe =
    """(!?)([A-Za-z_][A-Za-z0-9_]*)(\{(\d+)(,(\d+)?)?\}|\+|\?|\*)?(\?)?""".r

  def parse(spec: String): Compiled = {
    val s = spec.trim.replaceAll("\\s+", " ")

    val patternBody = PatternRe.findFirstMatchIn(s)
      .getOrElse(fail("missing PATTERN (...)", s)).group(1).trim
    val withinMs = WithinRe.findFirstMatchIn(s).map { m =>
      val n = m.group(1).toLong
      m.group(2).toUpperCase match {
        case "SECOND" => n * 1000L
        case "MINUTE" => n * 60000L
        case "HOUR"   => n * 3600000L
        case "DAY"    => n * 86400000L
      }
    }.getOrElse {
      // a WITHIN the grammar can't parse (e.g. MILLISECONDS) must be a
      // loud error, not a silent fall-through to the unbounded horizon
      // — an unbounded CEP horizon admits matches (and state) the user
      // explicitly asked to bound
      if ("""(?i)\bWITHIN\b""".r.findFirstIn(s).isDefined)
        fail("unparseable WITHIN clause (supported units: SECOND/MINUTE/HOUR/DAY)", s)
      Long.MaxValue / 4 // no WITHIN at all: unbounded horizon
    }
    val skip = SkipToVarRe.findFirstMatchIn(s) match {
      // SKIP TO FIRST/LAST <VAR> (TableSQLFunc.scala:1641,1694)
      case Some(m) if m.group(1).equalsIgnoreCase("FIRST") => SkipToFirst(m.group(2))
      case Some(m) => SkipToLast(m.group(2))
      case None =>
        val parsed = SkipRe.findFirstMatchIn(s)
          .map(_.group(1).replaceAll("\\s+", " ").toUpperCase)
        // same loud-error rule: a typo'd AFTER MATCH must not silently
        // become the SKIP PAST LAST ROW default
        if (parsed.isEmpty &&
            """(?i)\bAFTER\s+MATCH\b""".r.findFirstIn(s).isDefined)
          fail("unparseable AFTER MATCH clause", s)
        parsed.getOrElse("SKIP PAST LAST ROW") match {
          case "SKIP PAST LAST ROW" => SkipPastLastRow
          case "SKIP TO NEXT ROW"   => SkipToNext
          case "NO SKIP"            => NoSkip
        }
    }
    val defs: Map[String, Step => Step] =
      DefineRe.findFirstMatchIn(s) match {
        case None => Map.empty // every symbol a wildcard
        case Some(m) =>
          // split on commas that start a new `SYM AS` clause (commas
          // inside IN (...) lists don't match the lookahead)
          m.group(1).split(""",\s*(?=[A-Za-z_][A-Za-z0-9_]*\s+(?i:AS)\s)""")
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
        case "*"  => base.zeroUpTo(MaxRepeat) // bounded zero-or-more
        case _ if m.group(6) != null => // {1,n} (lower bound must be 1)
          if (m.group(4).toInt != 1) fail(s"only {1,n} ranges supported: '$tok'", s)
          base.upTo(m.group(6).toInt)
        case _ if m.group(5) != null => // {n,} open range, bounded at MaxRepeat
          val lo = m.group(4).toInt
          if (lo < 1 || lo > MaxRepeat)
            fail(s"open range lower bound must be in 1..$MaxRepeat: '$tok'", s)
          Seq.fill(lo)(base) ++ Seq.fill(MaxRepeat - lo)(base.opt)
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
  private val ValCmpRe = """(?i)(?:\w+\.)?value\s*(<=|>=|<|>|=)\s*(-?[0-9.]+(?:[eE]-?\d+)?)""".r
  private val AvgCmpRe = """(?i)AVG\s*\(\s*(?:\w+\.)?value\s*\)\s*(<=|>=|<|>|=)\s*(-?[0-9.]+(?:[eE]-?\d+)?)""".r
  private val PrevCmpRe = """(?i)(?:\w+\.)?value\s*(<=|>=|<|>|=)\s*PREV\s*\(\s*(?:\w+\.)?value\s*\)""".r

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

  // ---- navigation / OR condition compiler ---------------------------
  // MATCH_RECOGNIZE DEFINE with FIRST/LAST(SYM.value, n) navigation
  // and OR disjuncts (TableSQLFunc.scala:1622-1712, e.g.
  //   A AS LAST(A.price,1) IS NULL OR A.price > LAST(A.price,1)).
  // Conditions containing either compile to ONE navPred closure over
  // the symbol-tagged prefix; plain conjunctions keep the legacy
  // kinds/relPred compilation below (no behavior change).

  private val NavFnRe =
    """(?i)^(FIRST|LAST)\s*\(\s*(\w+)\.value\s*(?:,\s*(\d+))?\s*\)$""".r
  private val AvgFnRe = """(?i)^AVG\s*\(\s*(?:(\w+)\.)?value\s*\)$""".r
  private val PrevFnRe = """(?i)^PREV\s*\(\s*(?:\w+\.)?value\s*\)$""".r
  private val NavNullRe =
    """(?i)^(FIRST|LAST)\s*\(\s*(\w+)\.value\s*(?:,\s*(\d+))?\s*\)\s+IS\s+(NOT\s+)?NULL$""".r
  private val QualValRe = """(?i)^(\w+)\.value$""".r
  private val NumRe = """^-?[0-9.]+(?:[eE]-?\d+)?$""".r
  private val BinCmpRe = """(?s)^(.*?)\s*(<=|>=|<|>|=)\s*(.*)$""".r

  private def hasNavOrOr(cond: String): Boolean =
    """(?i)\bOR\b""".r.findFirstIn(cond).isDefined ||
      """(?i)\b(FIRST|LAST)\s*\(""".r.findFirstIn(cond).isDefined

  private type SymPrefix = Seq[(String, Double)]

  /** Rows of `sym` visible to a DEFINE of `self` on candidate `v`: the
    * prefix rows plus — for self-references — the candidate itself
    * (SQL:2016: inside A's DEFINE the candidate row tentatively
    * belongs to A, so LAST(A.value, 1) is the PREVIOUS A row). */
  private def rowsOf(sym: String, self: String, v: Double,
                     sp: SymPrefix): Seq[Double] =
    sp.collect { case (s, x) if s == sym => x } ++
      (if (sym == self) Seq(v) else Nil)

  /** Operand → Option[Double] evaluator (None = SQL NULL). */
  private def operand(expr: String, self: String)
      : Option[(KeyedEvent, SymPrefix) => Option[Double]] = expr.trim match {
    case NavFnRe(fn, sym, off) =>
      val o = Option(off).map(_.toInt).getOrElse(0)
      val first = fn.equalsIgnoreCase("FIRST")
      Some((e, sp) => {
        val rows = rowsOf(sym, self, e.value, sp)
        if (first) rows.lift(o) else rows.lift(rows.length - 1 - o)
      })
    case QualValRe(sym) =>
      if (sym == self) Some((e, _) => Some(e.value))
      else Some((e, sp) => rowsOf(sym, self, e.value, sp).lastOption)
    case t if t.equalsIgnoreCase("value") => Some((e, _) => Some(e.value))
    // AVG / PREV as nav-mode operands: the grammar admits them inside
    // OR disjuncts and alongside navigation terms, so the nav compiler
    // must evaluate them too (semantics identical to the legacy
    // conjunction compiler: AVG over the rows matched so far INCLUDING
    // the candidate; PREV = immediately preceding matched row, no
    // predecessor -> SQL NULL)
    case AvgFnRe(sym) =>
      Some((e, sp) => {
        val rows =
          if (sym == null) sp.map(_._2) :+ e.value
          else rowsOf(sym, self, e.value, sp)
        if (rows.isEmpty) None else Some(rows.sum / rows.length)
      })
    case PrevFnRe() => Some((_, sp) => sp.lastOption.map(_._2))
    case NumRe() => val n = expr.trim.toDouble; Some((_, _) => Some(n))
    case _ => None
  }

  /** One term of a nav-mode condition → predicate closure. */
  private def navTerm(term: String, self: String)
      : (KeyedEvent, SymPrefix) => Boolean = term.trim match {
    case t if t.equalsIgnoreCase("TRUE") => (_, _) => true
    case NavNullRe(fn, sym, off, not) =>
      val o = Option(off).map(_.toInt).getOrElse(0)
      val first = fn.equalsIgnoreCase("FIRST")
      val wantNull = not == null
      (e, sp) => {
        val rows = rowsOf(sym, self, e.value, sp)
        val r = if (first) rows.lift(o) else rows.lift(rows.length - 1 - o)
        r.isEmpty == wantNull
      }
    case KindEqRe(lit) => (e, _) => e.kind == lit
    case KindInRe(list) =>
      val lits = """'([^']*)'""".r.findAllMatchIn(list).map(_.group(1)).toSet
      (e, _) => lits.contains(e.kind)
    case BinCmpRe(l, op, r) =>
      (operand(l, self), operand(r, self)) match {
        case (Some(lf), Some(rf)) =>
          val c = cmp(op)
          (e, sp) => (for (a <- lf(e, sp); b <- rf(e, sp)) yield c(a, b))
            .getOrElse(false) // SQL: comparison with NULL is not true
        case _ => fail(s"unsupported navigation term '$term'", term)
      }
    case other => fail(s"unsupported DEFINE term '$other'", other)
  }

  /** Depth-aware split on a keyword at paren depth 0. */
  private def splitTop(s: String, word: String): Seq[String] = {
    val re = s"""(?i)\\b$word\\b""".r
    val cuts = re.findAllMatchIn(s).map(_.start).filter { i =>
      s.take(i).count(_ == '(') == s.take(i).count(_ == ')')
    }.toList
    var out = List.empty[String]
    var start = 0
    for (i <- cuts) { out ::= s.substring(start, i); start = i + word.length }
    (out.reverse :+ s.substring(start)).map(_.trim).filter(_.nonEmpty)
  }

  /** Strip one pair of parens that wraps the WHOLE string. */
  private def stripParens(s0: String): String = {
    val s = s0.trim
    if (s.startsWith("(") && s.endsWith(")")) {
      var depth = 0; var wraps = true
      for ((ch, i) <- s.zipWithIndex) {
        if (ch == '(') depth += 1
        else if (ch == ')') { depth -= 1; if (depth == 0 && i < s.length - 1) wraps = false }
      }
      if (wraps) stripParens(s.substring(1, s.length - 1)) else s
    } else s
  }

  /** Full nav-mode condition: OR of AND-conjunctions (with optional
    * parens around each disjunct). */
  private def navCond(cond: String, self: String)
      : (KeyedEvent, SymPrefix) => Boolean = {
    val disjs = splitTop(cond, "OR").map { d =>
      val terms = splitTop(stripParens(d), "AND").map(t => navTerm(stripParens(t), self))
      terms.reduce[(KeyedEvent, SymPrefix) => Boolean] {
        (f, g) => (e, sp) => f(e, sp) && g(e, sp) }
    }
    disjs.reduce[(KeyedEvent, SymPrefix) => Boolean] {
      (f, g) => (e, sp) => f(e, sp) || g(e, sp) }
  }

  private def parseDefine(clause: String): (String, Step => Step) = {
    val parts = clause.trim.split("""(?i)\s+AS\s+""", 2)
    if (parts.length != 2) fail("DEFINE clause needs 'SYM AS cond'", clause)
    val sym = parts(0).trim
    if (hasNavOrOr(parts(1))) {
      val pred = navCond(parts(1).trim, sym)
      return sym -> ((st: Step) => st.nav(pred))
    }
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
