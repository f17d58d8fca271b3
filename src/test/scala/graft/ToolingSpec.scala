package graft

import org.apache.spark.sql.functions._

/** Unit pins for the round-12 instruments: the median-of-probe-ratios
  * host calibration (Bench.hostScale) and the huge-value corruption
  * generator (HugeExec.corrupt). Both adjudicate other results —
  * a drift instrument that over-corrects or a sweep that silently
  * corrupts nothing would invalidate conclusions downstream, so their
  * own contracts get direct tests.
  */
class ToolingSpec extends SparkSpec {

  private def probes(c: Double, s: Double, w: Double) =
    Seq("cal_cpu" -> c, "cal_shuffle" -> s, "cal_window" -> w)

  test("hostScale replays the r11 driver anomaly to ~1.17, not 4.7") {
    // the exact numbers from the r11 driver bench whose sum-based
    // host_scale shipped 4.711 / value_cal 21.6 s
    val start = probes(0.227, 0.532, 6.072)
    val end = probes(0.068, 0.313, 5.765)
    val hs = Bench.hostScale(start, end)
    assert(math.abs(hs - 0.313 / 0.268) < 1e-9,
      s"median ratio should be the shuffle probe's ${0.313 / 0.268}, got $hs")
    assert(hs > 1.1 && hs < 1.25, s"replayed r11 host_scale: $hs")
  }

  test("hostScale takes min(start, end) per probe and survives failed probes") {
    // min discards one-sided JIT residue: cpu start inflated 3×
    val warm = Bench.hostScale(probes(0.276, 0.268, 0.639),
      probes(0.092, 0.268, 0.639))
    assert(math.abs(warm - 1.0) < 1e-9, s"JIT-inflated start not discarded: $warm")
    // a probe reporting -1 in BOTH blocks is excluded, not a poison
    // pill; with 2 live ratios the median AVERAGES the middle pair —
    // the old upper-median let the larger ratio always win in exactly
    // the degraded case (ADVICE r12)
    val oneDead = Bench.hostScale(probes(-1.0, 0.536, 0.639),
      probes(-1.0, 0.536, 1.278))
    assert(math.abs(oneDead - 1.5) < 1e-9,
      s"dead probe should leave median of {2.0, 1.0}=1.5 (mean of pair), got $oneDead")
    // -1 in one block only: the live block's value is used
    val halfDead = Bench.hostScale(probes(0.092, -1.0, 0.639),
      probes(0.092, 0.536, 0.639))
    assert(math.abs(halfDead - 1.0) < 1e-9, s"half-dead probe mishandled: $halfDead")
    // all probes dead → -1 sentinel (Bench reports value_cal = -1)
    assert(Bench.hostScale(probes(-1, -1, -1), probes(-1, -1, -1)) == -1.0)
  }

  test("suspectsOf flags the r12 excursion, not calm noise") {
    // replay: BENCH_r12's dd_tfidf_cos read 18.0 s at host_scale 1.498
    // against a 2.624 s committed calm ref — must be retimed
    val r12 = Seq("dd_tfidf_cos" -> 17.972, "dd_containment" -> 3.519)
    assert(Bench.suspectsOf(r12, 1.498) == Seq("dd_tfidf_cos"))
    // a query running AT its calm ref is never a suspect, nor is a
    // failed one (-1), nor a name with no committed reference
    assert(Bench.suspectsOf(Seq("dd_tfidf_cos" -> 2.624,
      "dd_cdc" -> -1.0, "q_not_in_refs" -> 99.0), 1.0).isEmpty)
    // absolute slack: a 0.129 s query tripling to 0.5 s is scheduler
    // noise, not an excursion worth a retime slot
    assert(Bench.suspectsOf(Seq("tw_windowall" -> 0.5), 1.0).isEmpty)
    assert(Bench.suspectsOf(Seq("tw_windowall" -> 1.2), 1.0) ==
      Seq("tw_windowall"), "0.129 s ref at 1.2 s is 9x AND past slack")
    // host_scale scales the threshold (3x ref x 2.0): 14 s at scale
    // 2.0 is under 2.624*3*2=15.7 — not a suspect; floored at 1 for a
    // fast host so calm refs are never shrunk
    assert(Bench.suspectsOf(Seq("dd_tfidf_cos" -> 14.0), 2.0).isEmpty)
    assert(Bench.suspectsOf(Seq("dd_tfidf_cos" -> 14.0), 0.5) ==
      Seq("dd_tfidf_cos"))
    // worst-excess-first ordering and the MaxRetimes cap
    val many = BenchRefs.calm.toSeq.sortBy(_._1).take(Bench.MaxRetimes + 5)
      .zipWithIndex.map { case ((n, ref), i) => n -> (ref * 10 + i) }
    val s = Bench.suspectsOf(many, 1.0)
    assert(s.size == Bench.MaxRetimes, s"cap: ${s.size}")
    val excess = many.toMap
    assert(s == s.sortBy(n => -(excess(n) - BenchRefs.calm(n))), "worst first")
  }

  test("BenchRefs covers the full catalog") {
    val missing = SparkEntry.queries.keySet -- BenchRefs.calm.keySet
    assert(missing.isEmpty,
      s"queries without a calm bench reference (regenerate BenchRefs " +
        s"from a calm full run): ${missing.mkString(",")}")
  }

  test("HugeExec.corrupt inflates the advertised columns, deterministically") {
    val s = spark
    import s.implicits._
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(j => (i + j).toFloat), i.toInt % 3))
      .toDF("vec_id", "embedding", "label")
    val c1 = graft.tools.HugeExec.corrupt(emb, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).length)).sortBy(_._1)
    val c2 = graft.tools.HugeExec.corrupt(emb, "embeddings").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).length)).sortBy(_._1)
    assert(c1.toList == c2.toList, "corruption mask must be deterministic")
    val padded = c1.filter(_._2 == 4096)
    assert(padded.nonEmpty, "no embedding padded to 4096 in 64 rows")
    assert(c1.count(_._2 == 8) > padded.length, "most rows must stay nominal")
    // documents: text inflated to >= target on masked rows only
    val docs = (0L until 64L).map(i => (i, s"doc body $i", "en"))
      .toDF("doc_id", "text", "lang")
    val lens = graft.tools.HugeExec.corrupt(docs, "documents").collect()
      .map(r => r.getString(1).length)
    assert(lens.exists(_ >= 500000), "no 500KB doc in 64 rows")
    assert(lens.count(_ < 100) > lens.count(_ >= 500000), "most docs nominal")
    // events: deep-nested props still parse as JSON (depth 800 is
    // under Jackson's nesting cap) and the original key reads null
    val ev = (0L until 64L).map(i => (i, i % 7, s"""{"k":$i}"""))
      .toDF("event_id", "user_id", "props")
    val deep = graft.tools.HugeExec.corrupt(ev, "events")
      .filter(length(col("props")) > 1000)
    assert(deep.count() > 0, "no deep-nested props in 64 rows")
    val parsed = deep.select(
      get_json_object(col("props"), "$.d").isNotNull.as("hasD"),
      get_json_object(col("props"), "$.k").isNull.as("noK")).collect()
    assert(parsed.forall(r => r.getBoolean(0) && r.getBoolean(1)),
      "800-deep JSON must parse with $.d present and $.k absent")
  }
}
