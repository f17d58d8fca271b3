package graft.streaming

import java.io.PrintWriter
import java.net.ServerSocket
import graft.SparkSpec
import graft.sources.Readers

/** socketTextStream (Source.scala:99-114) against a real local TCP
  * server — the line-by-line socket source end-to-end. */
class SocketSourceSpec extends SparkSpec {

  test("socket source streams lines from a TCP server") {
    val server = new ServerSocket(0)
    val lines = Seq("alpha", "beta", "gamma")
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the socket open; the query is stopped by the test
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val q = Readers.socket(spark, "localhost", server.getLocalPort)
      .writeStream.format("memory").queryName("sock")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var got = Array.empty[String]
      while (got.length < lines.size && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        got = spark.table("sock").collect().map(_.getString(0))
      }
      assert(got.sorted.toSeq == lines.sorted, s"got ${got.toSeq}")
    } finally {
      q.stop()
      server.close()
    }
  }
}
