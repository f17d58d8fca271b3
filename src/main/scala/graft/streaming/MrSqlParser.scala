package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for MATCH_RECOGNIZE via `injectParser` — the parser
  * extension tier of SparkSessionExtensions (the one tier the engine
  * didn't already exercise). Queries of the shape
  *
  * {{{
  * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <keyCol> ORDER BY <tsCol>
  *   [KIND <kindCol>] [MEASURE <valueCol>]
  *   [MEASURES <fn>([SYM.]value|*[, off]) AS <alias> (, ...)*]
  *                          -- fn: FIRST LAST MIN MAX SUM AVG COUNT;
  *                          -- SYM. restricts to that variable's rows,
  *                          -- off navigates FIRST/LAST (SQL:2016)
  *   PATTERN (...) [WITHIN ...] [AFTER MATCH ...] DEFINE ...
  * )
  * }}}
  *
  * parse through MrParser and plan as the SeqPattern NFA (batch
  * flatMapGroupsWithState, strict contiguity — the reference's
  * MATCH_RECOGNIZE row semantics, TableSQLFunc.scala:1569-2240).
  * Everything else delegates to Spark's parser untouched.
  *
  * Documented deviations from SQL:2016: fixed MEASURES output
  * (key, m_start, m_end, sum_v, n); `KIND`/`MEASURE` clauses map the
  * classifier and value columns (defaults `event_type`, `value`)
  * because DEFINE conditions reference the builtin names
  * `kind`/`value`; one pattern per statement.
  */
object MrSql {
  private val Re =
    """(?is)^\s*FROM\s+([\w.]+)\s+MATCH_RECOGNIZE\s*\(\s*PARTITION\s+BY\s+(\w+)\s+ORDER\s+BY\s+(\w+)\s+(?:KIND\s+(\w+)\s+)?(?:MEASURE\s+(\w+)\s+)?(?:MEASURES\s+(.*?)\s+)?(PATTERN\b.*)\)\s*;?\s*$""".r
  private val MeasureRe =
    """(?i)(FIRST|LAST|MIN|MAX|SUM|AVG|COUNT)\s*\(\s*(?:(\w+)\.)?(?:value|\*)\s*(?:,\s*(\d+))?\s*\)\s+AS\s+(\w+)""".r

  /** A MEASURES item: `fn([SYM.]value[, off]) AS alias` over the
    * matched-values array, restricted to SYM's rows when qualified
    * (multi-variable MEASURES, TableSQLFunc.scala:1703-1712 — e.g.
    * `FIRST(A.price) AS START_PRICE, LAST(A.price, 1) AS ...`).
    * FIRST/LAST take an optional offset; out-of-range → NULL. */
  private def measure(fn: String, sym: String, off: Int,
                      alias: String): org.apache.spark.sql.Column = {
    // per-variable value list: rows whose symbol matches (all rows
    // when unqualified) — MatchOut.syms is parallel to values
    val vs =
      if (sym == null) col("values")
      else transform(
        filter(arrays_zip(col("syms"), col("values")),
          x => x.getField("syms") === sym),
        x => x.getField("values"))
    // try_element_at / empty-guards, not element_at / bare division:
    // Spark 4 runs ANSI mode by default, where an out-of-range offset
    // (LAST(A.value, n) with fewer than n+1 A-rows) or AVG over a
    // zero-row optional symbol would THROW instead of yielding the
    // NULL this surface documents (and SQL semantics require).
    (fn.toUpperCase match {
      case "FIRST" => try_element_at(vs, lit(off + 1))
      case "LAST"  => try_element_at(vs, lit(-(off + 1)))
      case "MIN"   => array_min(vs)
      case "MAX"   => array_max(vs)
      case "SUM"   => when(size(vs) > 0,
        aggregate(vs, lit(0.0), (a, v) => a + v))
      case "AVG"   => when(size(vs) > 0,
        aggregate(vs, lit(0.0), (a, v) => a + v) / size(vs))
      case "COUNT" => size(vs)
    }).as(alias)
  }

  /** The statement pieces before planning — exposed package-private so
    * the round-trip property spec can compare the frontend's extraction
    * (clause isolation, MEASURES compilation, pattern-tail capture)
    * against a direct `MrParser.parse` of the same spec text without
    * needing a table or a session. `spec` is the verbatim
    * `PATTERN ... DEFINE ...` tail the statement regex captured. */
  private[streaming] case class ParsedMr(
      table: String, keyCol: String, tsCol: String,
      kindCol: String, valCol: String,
      measures: Seq[org.apache.spark.sql.Column],
      spec: String, compiled: MrParser.Compiled)

  private[streaming] def parseSpec(text: String): Option[ParsedMr] = {
    if (!text.toUpperCase.contains("MATCH_RECOGNIZE")) return None
    Re.findFirstMatchIn(text).map { m =>
      val kindC = Option(m.group(4)).getOrElse("event_type")
      val valC = Option(m.group(5)).getOrElse("value")
      val measures = Option(m.group(6)) match {
        case Some(list) =>
          val ms = MeasureRe.findAllMatchIn(list)
            .map(mm => measure(mm.group(1), mm.group(2),
              Option(mm.group(3)).map(_.toInt).getOrElse(0),
              mm.group(4))).toSeq
          if (ms.isEmpty)
            throw new IllegalArgumentException(
              s"MATCH_RECOGNIZE: unparseable MEASURES list: $list")
          ms
        case None => Seq( // default measures
          aggregate(col("values"), lit(0.0), (a, v) => a + v).as("sum_v"),
          size(col("values")).as("n"))
      }
      ParsedMr(m.group(1), m.group(2), m.group(3), kindC, valC,
        measures, m.group(7), MrParser.parse(m.group(7)))
    }
  }

  def rewrite(session: SparkSession, text: String): Option[LogicalPlan] =
    parseSpec(text).map { p =>
      import session.implicits._
      val pat = p.compiled
      val ev = session.table(p.table).select(
        col(p.keyCol).cast("long").as("key"), col(p.tsCol).as("ts"),
        col(p.kindCol).as("kind"), col(p.valCol).cast("double").as("value"))
        .transform(KeyedEvent.ingest)
      SeqPattern.detect(ev, pat.steps, pat.withinMs, strict = true,
          pat.skip, pat.greedy, flushEnd = true)
        .toDF()
        .select(Seq(col("key").as(p.keyCol), col("startTs").as("m_start"),
          col("endTs").as("m_end")) ++ p.measures: _*)
        .queryExecution.logical
    }
}

class MrSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    MrSql.rewrite(session, sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    MrSql.rewrite(session, sqlText).getOrElse(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
