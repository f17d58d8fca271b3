package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState (Spark 4 stateful API): the Value/Map/List state
  * trio survives across micro-batches and the recent-list stays
  * bounded. */
class TransformWithStateSpec extends SparkSpec {

  test("profile keeps count/kind-map/recent-list across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[KeyedEvent]
    val q = ProfileProcessor.profile(input.toDS(), keepRecent = 2)
      .writeStream.format("memory").queryName("twsp")
      .outputMode("update").start()
    try {
      input.addData(
        KeyedEvent(1L, ts(1000L), "click", 1.0),
        KeyedEvent(1L, ts(2000L), "view", 2.0))
      q.processAllAvailable()
      input.addData(KeyedEvent(1L, ts(3000L), "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("twsp").collect()
        .map(r => (r.getLong(1), r.getMap[String, Long](2).toMap, r.getSeq[Double](3)))
      // last update: 3 events total, clicks=2 views=1, recent trimmed to 2
      val last = rows.maxBy(_._1)
      assert(last._1 == 3L, s"got ${rows.toSeq}")
      assert(last._2 == Map("click" -> 2L, "view" -> 1L))
      assert(last._3 == Seq(2.0, 3.0)) // bounded to keepRecent
    } finally {
      q.stop()
      if (prev.nonEmpty)
        s.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
      else s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
