package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** CDC surface: debezium-json envelope parsing and changelog
  * materialization (batch + streaming latest-wins with tombstones) —
  * the reference's kafka+debezium-json DDL connector semantics
  * (TableSQLFunc.scala:1122-1138). */
class CdcSpec extends SparkSpec {

  private val payload = new StructType()
    .add("id", LongType).add("name", StringType)

  test("debezium envelope parse: after for c/u/r, before for d") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      """{"before":null,"after":{"id":1,"name":"a"},"op":"c","ts_ms":100}""",
      """{"before":{"id":1,"name":"a"},"after":{"id":1,"name":"b"},"op":"u","ts_ms":200}""",
      """{"before":{"id":1,"name":"b"},"after":null,"op":"d","ts_ms":300}""",
      """{"before":null,"after":{"id":2,"name":"x"},"op":"r","ts_ms":50}""")
      .toDF("json")
    val parsed = Cdc.parseDebezium(raw, "json", payload)
      .select(col("op"), col("row.id"), col("row.name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(parsed.toSeq == Seq(
      ("c", 1L, "a"), ("u", 1L, "b"), ("d", 1L, "b"), ("r", 2L, "x")))
  }

  test("batch materialize: latest op wins, trailing delete tombstones") {
    val s = spark
    import s.implicits._
    val changelog = Seq(
      (1L, "c", 10.0, 1L), (1L, "u", 11.0, 2L),  // live, latest 11.0
      (2L, "c", 20.0, 1L), (2L, "d", 0.0, 2L),   // deleted
      (3L, "d", 0.0, 1L), (3L, "c", 30.0, 2L))   // re-created after delete
      .toDF("key", "op", "value", "seq")
    val out = Cdc.materialize(changelog, "key", Seq("seq"))
      .select("key", "value").collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.toSet == Set(1L -> 11.0, 3L -> 30.0))
  }

  test("batch materialize == brute-force latest-per-key on random changelogs") {
    // pins the max_by-struct rewrite (hash-agg, no window) to the
    // specification: lexicographic max over seqCols picks the same row
    // row_number-desc did, tombstones drop the key
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(120)
      // distinct (key, seq) pairs so "latest" is well-defined
      val changes = rnd.shuffle(
        (0 until n).map(i => (i % 7).toLong -> (i / 7).toLong).toList)
        .map { case (k, seq) =>
          (k, Seq("c", "u", "d")(rnd.nextInt(3)), rnd.nextDouble(), seq) }
      val expected = changes.groupBy(_._1).values
        .map(_.maxBy(_._4)).filter(_._2 != "d")
        .map(c => (c._1, c._4)).toSet
      val got = Cdc.materialize(changes.toDF("key", "op", "value", "seq"),
          "key", Seq("seq"))
        .select("key", "seq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected, s"trial $trial diverged")
    }
  }

  test("streaming materialize: updates apply in seq order, late change cannot resurrect a tombstone") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[Cdc.Change]
    val q = Cdc.materializeStream(input.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Seq(
        Cdc.Change(1L, "c", 10.0, 1L), Cdc.Change(2L, "c", 20.0, 1L)))
      q.processAllAvailable()
      input.addData(Seq(
        Cdc.Change(1L, "u", 11.0, 2L), Cdc.Change(2L, "d", 0.0, 2L),
        Cdc.Change(3L, "c", 30.0, 1L)))
      q.processAllAvailable()
      // late change for key 2 with seq BELOW the tombstone: ignored
      input.addData(Seq(Cdc.Change(2L, "u", 25.0, 1L)))
      q.processAllAvailable()
      // latest emitted image per key (memory sink keeps every update)
      val last = spark.table("cdc").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._3) }
      assert(last(1L) == (1L, 11.0, 2L))
      assert(last(3L) == (3L, 30.0, 1L))
      val t2 = last(2L)
      assert(t2._3 == 2L && t2._2.isNaN, s"tombstone not preserved: $t2")
    } finally q.stop()
  }

  test("materialization is delivery-order invariant: final state = max-seq change per key") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // random change logs under random batching and within-batch order:
    // the final image per key must be its highest-seq change (value,
    // or NaN tombstone for a delete) — the CDC guarantee an upsert
    // sink consumer relies on, independent of how kafka partitions
    // interleave the stream
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val ops = Seq("c", "u", "u", "d") // deletes at 25%
      val changes = (1 to 40).map(seq => Cdc.Change(
        1L + rnd.nextInt(5), ops(rnd.nextInt(ops.size)),
        math.rint(rnd.nextDouble() * 100), seq.toLong))
      val delivery = rnd.shuffle(changes)
      val input = MemoryStream[Cdc.Change]
      val finalState = scala.collection.mutable.Map.empty[Long, (Double, Long)]
      val q = Cdc.materializeStream(input.toDS())
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Cdc.KeyState], _: Long) =>
          b.collect().foreach(ks =>
            CdcSpec.sync { finalState(ks.key) = (ks.value, ks.seq) })
        }
        .outputMode(OutputMode.Update()).start()
      try {
        // batches of random size 1..7
        var rest = delivery
        while (rest.nonEmpty) {
          val (b, r) = rest.splitAt(1 + rnd.nextInt(7))
          input.addData(b); rest = r
        }
        q.processAllAvailable()
        changes.groupBy(_.key).foreach { case (k, cs) =>
          val top = cs.maxBy(_.seq)
          val (v, seq) = finalState(k)
          assert(seq == top.seq, s"seed=$seed key=$k: seq $seq != ${top.seq}")
          if (top.op == "d") assert(v.isNaN, s"seed=$seed key=$k: expected tombstone")
          else assert(v == top.value, s"seed=$seed key=$k: $v != ${top.value}")
        }
      } finally q.stop()
    }
  }
}

object CdcSpec {
  private val lock = new Object
  def sync[A](f: => A): A = lock.synchronized(f)
}
