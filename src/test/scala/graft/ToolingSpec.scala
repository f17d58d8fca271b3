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
    // a probe reporting -1 in BOTH blocks is excluded, not a poison pill
    val oneDead = Bench.hostScale(probes(-1.0, 0.536, 0.639),
      probes(-1.0, 0.536, 1.278))
    assert(math.abs(oneDead - 2.0) < 1e-9,
      s"dead probe should leave median of {2.0, 1.0}=2.0 (upper), got $oneDead")
    // -1 in one block only: the live block's value is used
    val halfDead = Bench.hostScale(probes(0.092, -1.0, 0.639),
      probes(0.092, 0.536, 0.639))
    assert(math.abs(halfDead - 1.0) < 1e-9, s"half-dead probe mishandled: $halfDead")
    // all probes dead → -1 sentinel (Bench reports value_cal = -1)
    assert(Bench.hostScale(probes(-1, -1, -1), probes(-1, -1, -1)) == -1.0)
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
