package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP-lite: per-key sequence-pattern detection as an NFA interpreted
  * inside `flatMapGroupsWithState` — the Spark-native port of the
  * reference's CEP library core (CEPDemo.scala:32-949) and
  * MATCH_RECOGNIZE skeleton (TableSQLFunc.scala:1569-2240).
  *
  * Scope (covers every concrete reference scenario): ordered steps
  * with per-step predicates including AGGREGATE conditions over the
  * accumulated match (MATCH_RECOGNIZE `AVG(A.value)` in DEFINE,
  * TableSQLFunc.scala:1845-1851), contiguity `strict` (CEP `next`)
  * or `relaxed` (`followedBy`), `WITHIN` horizon, quantifiers
  * `times(n)`/`optional`, and AFTER MATCH skip strategies
  * SKIP_PAST_LAST_ROW / SKIP_TO_NEXT / NO_SKIP
  * (CEPDemo.scala:808-949).
  *
  * State is the set of live partial matches per key, pruned by the
  * `within` horizon on every element — bounded by (pattern length ×
  * events inside the horizon), independent of stream length, so the
  * state store stays O(keys × horizon density) at any scale.
  */
object SeqPattern {
  /** One NFA step: name + predicate over (kind, value), with CEP
    * quantifiers — `times(n)` repeats the step (CEPDemo times(n)),
    * `optional` lets it be skipped (CEPDemo optional). `oneOrMore`
    * with an upper bound maxRepeat expands to one required + maxRepeat-1
    * optional repetitions (bounded expansion keeps state finite). */
  case class Step(name: String, kinds: Set[String],
                  minValue: Double = Double.MinValue,
                  repeat: Int = 1, optional: Boolean = false,
                  // iterative/aggregate condition: (event value, values
                  // matched so far) => accept — the DEFINE-with-AVG class
                  relPred: Option[(Double, Seq[Double]) => Boolean] = None) {
    def matches(e: KeyedEvent, prefix: Seq[Double]): Boolean =
      kinds.contains(e.kind) && e.value >= minValue &&
        relPred.forall(_(e.value, prefix))
    def times(n: Int): Step = copy(repeat = n)
    def opt: Step = copy(optional = true)
    /** Bounded oneOrMore: 1..n repetitions (1 required + n-1 optional;
      * bounded expansion keeps NFA state finite — CEP oneOrMore with
      * an explicit cap, CEPDemo timesOrMore). */
    def upTo(n: Int): Seq[Step] =
      copy(repeat = 1) +: Seq.fill(n - 1)(copy(repeat = 1, optional = true))
    def where(p: (Double, Seq[Double]) => Boolean): Step =
      copy(relPred = Some(p))
  }

  /** AFTER MATCH skip strategy (CEPDemo.scala:808-949). */
  sealed trait Skip
  /** Clear all partials on a match (default; SKIP PAST LAST ROW). */
  case object SkipPastLastRow extends Skip
  /** Keep partials that started after the match's first row. */
  case object SkipToNext extends Skip
  /** Keep every live partial (noSkip — overlapping matches allowed). */
  case object NoSkip extends Skip

  /** Expand quantified steps into the flat NFA step list. */
  private[graft] def expand(steps: Seq[Step]): IndexedSeq[Step] =
    steps.flatMap(s => Seq.fill(s.repeat)(s.copy(repeat = 1))).toIndexedSeq

  case class Partial(stepIdx: Int, tss: List[Long], vals: List[Double])
  case class MatchOut(key: Long, startTs: Timestamp, endTs: Timestamp,
                      values: Seq[Double])

  implicit val matchEnc: Encoder[MatchOut] = Encoders.product[MatchOut]
  /** State = live partial matches, wrapped in a Product for encoding. */
  case class PartialSet(xs: List[Partial])

  /** Run the pattern over a keyed stream. `strict` = CEP `next`
    * (no intervening event may break the chain); relaxed = `followedBy`. */
  /** @param greedy when several branches complete on the same event
    *   (quantified patterns), emit the LONGEST match (CEP greedy);
    *   false = reluctant `*?` — emit the shortest. */
  def detect(ds: Dataset[KeyedEvent], steps: Seq[Step], withinMs: Long,
             strict: Boolean, skip: Skip = SkipPastLastRow,
             greedy: Boolean = true): Dataset[MatchOut] = {
    import ds.sparkSession.implicits._
    val stepsB = expand(steps)
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[PartialSet, MatchOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, events, state: GroupState[PartialSet]) =>
          var partials = state.getOption.map(_.xs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[MatchOut]
          // NFA branching: from step `from`, an event may match that
          // step, or — when steps are optional — any step reachable by
          // skipping a prefix of optional steps (one branch per hit).
          def matchIdxs(from: Int, e: KeyedEvent, prefix: Seq[Double]): List[Int] = {
            val hits = scala.collection.mutable.ListBuffer.empty[Int]
            var j = from
            var scanning = true
            while (scanning && j < stepsB.length) {
              if (stepsB(j).matches(e, prefix)) hits += j
              if (stepsB(j).optional) j += 1 else scanning = false
            }
            hits.toList
          }
          events.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
            val t = e.ts.getTime
            // prune expired partials
            partials = partials.filter(p => t - p.tss.head <= withinMs)
            // advance existing partials
            val advanced = partials.flatMap { p =>
              val hits = matchIdxs(p.stepIdx, e, p.vals)
              if (hits.nonEmpty)
                hits.map(j => Partial(j + 1, p.tss :+ t, p.vals :+ e.value))
              else if (strict) Nil // strict contiguity: chain broken
              else List(p)         // relaxed: partial survives
            }
            // start new partials from step 0 (and optional-skipped starts)
            val started =
              matchIdxs(0, e, Nil).map(j => Partial(j + 1, List(t), List(e.value)))
            val (complete, live) =
              (advanced ++ started).partition(_.stepIdx >= stepsB.length)
            // greedy/reluctant: among branches completing on the SAME
            // event, keep the longest (greedy) or shortest (reluctant)
            val emitted =
              if (complete.size <= 1) complete
              else if (greedy) List(complete.maxBy(_.vals.length))
              else List(complete.minBy(_.vals.length))
            emitted.foreach { m =>
              out += MatchOut(key, new Timestamp(m.tss.head),
                new Timestamp(m.tss.last), m.vals)
            }
            // AFTER MATCH skip strategy
            partials =
              if (complete.isEmpty) live
              else skip match {
                case SkipPastLastRow => Nil
                case SkipToNext =>
                  val firstTs = complete.map(_.tss.head).min
                  live.filter(_.tss.head > firstTs)
                case NoSkip => live
              }
          }
          state.update(PartialSet(partials))
          out.iterator
      }
  }
}
