package graft.streaming

import graft.streaming.SeqPattern._

/** Brute-force reference machine for PLAIN KIND CHAINS (no
  * anyMatch/optional steps): first-hit advancement, WITHIN expiry,
  * completion, and all five AFTER MATCH skip strategies — implemented
  * independently of the NFA so properties can cross-check it. Shared
  * by CepPropertySpec (combinator surface) and MrParserPropertySpec
  * (parsed-SQL surface). */
object ChainModel {
  private def ts(e: KeyedEvent): Long = e.ts.getTime

  def chainScan(es: List[KeyedEvent], names: List[String],
      kinds: List[String], w: Long, skip: Skip,
      strict: Boolean = false): Set[List[Double]] = {
    case class P(tss: List[Long], vals: List[Double], idx: Int)
    var ps = List.empty[P]
    val out = scala.collection.mutable.Set.empty[List[Double]]
    es.sortBy(e => (ts(e), e.value)).foreach { e =>
      val t = ts(e)
      ps = ps.filter(p => t - p.tss.head <= w) // WITHIN horizon
      val adv = ps.flatMap { p =>
        if (p.idx < kinds.length && e.kind == kinds(p.idx))
          List(P(p.tss :+ t, p.vals :+ e.value, p.idx + 1))
        else if (strict) Nil // contiguity broken: partial dies
        else List(p)
      }
      val started =
        if (e.kind == kinds.head) List(P(List(t), List(e.value), 1)) else Nil
      val cands = adv ++ started
      val (complete, live) = cands.partition(_.idx == kinds.length)
      if (complete.isEmpty) ps = live
      else {
        val first = complete.map(_.tss.head).min
        (skip match {
          // simultaneous completions overlap: leftmost start only
          case SkipPastLastRow => complete.filter(_.tss.head == first)
          case _ => complete
        }).foreach(p => out += p.vals)
        def anchor(v: String, last: Boolean): Option[Long] = {
          val m = complete.minBy(_.tss.head)
          val rows = names.zip(m.tss).collect { case (n, tr) if n == v => tr }
          if (last) rows.lastOption else rows.headOption
        }
        ps = skip match {
          case SkipPastLastRow => Nil
          case SkipToNext      => live.filter(_.tss.head > first)
          case NoSkip          => live
          case SkipToFirst(v)  => anchor(v, last = false)
            .map(a => live.filter(_.tss.head >= a)).getOrElse(live)
          case SkipToLast(v)   => anchor(v, last = true)
            .map(a => live.filter(_.tss.head >= a)).getOrElse(live)
        }
      }
    }
    out.toSet
  }
}
