package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming LSH near-dup detection (incremental dd_minhash): band
  * buckets registered by first claimant, later colliders flagged,
  * event-time ttl evicts idle buckets once the watermark passes. */
class NearDupStreamSpec extends SparkSpec {

  private val textA = "the quick brown fox jumps over the lazy dog again and again today"
  private val textB = "completely different words about spark catalyst tungsten plans and shuffles here"
  private val textC = "a third document with its own unique vocabulary for bucket registration checks"

  test("identical later doc collides on all bands against the original") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StatefulOps.nearDupStream(in.toDS())
      .writeStream.format("memory").queryName("ndup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, textA, ts(1000L)), (2L, textB, ts(1000L)))
      q.processAllAvailable()
      assert(spark.table("ndup").count() == 0, "first arrivals must not self-flag")
      in.addData((3L, textA, ts(2000L))) // exact dup of doc 1 -> all 4 bands collide
      q.processAllAvailable()
      val hits = spark.table("ndup").as[BandHit].collect()
      assert(hits.length == 4)
      assert(hits.forall(h => h.docId == 3L && h.firstDocId == 1L))
      assert(hits.map(_.band).toSet == Set(0, 1, 2, 3))
    } finally q.stop()
  }

  test("in-batch ties resolve to the lowest doc_id") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StatefulOps.nearDupStream(in.toDS())
      .writeStream.format("memory").queryName("ndup2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((5L, textC, ts(1000L)), (4L, textC, ts(1000L))) // same batch, same buckets
      q.processAllAvailable()
      val hits = spark.table("ndup2").as[BandHit].collect()
      assert(hits.length == 4)
      assert(hits.forall(h => h.docId == 5L && h.firstDocId == 4L))
    } finally q.stop()
  }

  test("event-time ttl evicts idle buckets: a dup after the horizon is clean") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StatefulOps.nearDupStream(in.toDS(), ttlMs = 2000L)
      .writeStream.format("memory").queryName("ndup3")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((1L, textA, ts(1000L))) // horizon: watermark > 3000
      q.processAllAvailable()
      in.addData((9L, textB, ts(10000L))) // advances watermark to 10000
      q.processAllAvailable()
      // batch 3 carries no textA rows -> its buckets time out and drop;
      // the textC pair is the positive control proving the batch ran
      in.addData((11L, textC, ts(11000L)), (12L, textC, ts(11000L)))
      q.processAllAvailable()
      in.addData((10L, textA, ts(12000L))) // buckets were evicted -> clean
      q.processAllAvailable()
      val hits = spark.table("ndup3").as[BandHit].collect()
      assert(hits.exists(h => h.docId == 12L && h.firstDocId == 11L),
        "positive control lost — batches did not process")
      assert(!hits.exists(_.docId == 10L),
        "state survived past the event-time ttl horizon — eviction not working")
    } finally q.stop()
  }
}
