package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class Click(ts: Timestamp, page: String)

/** Port of the reference's click-count invariant
  * (ClickEventCount.java:65-104 + ReadMe.md:122-145): with the
  * deterministic generator (N events per 15 s window per page), every
  * closed window must count exactly N — the correctness contract the
  * reference verifies across failures/rescaling. */
class ClickCountSpec extends SparkSpec {

  test("each closed 15s window counts exactly N events per page") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val n = 100
    val pages = Seq("/index", "/shop", "/news")
    val input = MemoryStream[Click]
    // two full windows, events spread evenly, out of order within ±150ms
    val base = 1700000000000L - (1700000000000L % 15000)
    val events = for {
      w <- 0 until 2
      p <- pages
      i <- 0 until n
    } yield Click(ts(base + w * 15000L + (i * 14999L / n)), p)
    input.addData(scala.util.Random.shuffle(events))
    // watermark flush: one event far past both windows
    input.addData(Click(ts(base + 60000L), "/flush"))

    val q = StreamPipelines.clickCount(input.toDF(), "ts", "page")
      .writeStream.format("memory").queryName("clicks")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = s.sql(
        s"SELECT page, cnt FROM clicks WHERE w_start >= timestamp_millis(${base}L) " +
        s"AND w_start < timestamp_millis(${base + 30000L}L)").collect()
      assert(rows.length == pages.size * 2, s"got ${rows.toSeq}")
      assert(rows.forall(_.getLong(1) == n),
        s"windows not exactly $n: ${rows.toSeq}")
    } finally q.stop()
  }
}
