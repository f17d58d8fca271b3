package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real image decode (round-10 verdict #5): the ImageIO path must
  * produce ACTUAL pixel stats on generated fixtures — not the byte
  * pseudo-features — for the pure-JVM formats (PNG, BMP), and must
  * fall back (flagged) on payloads no JDK reader can parse. */
class MultimodalDecodeSpec extends SparkSpec {

  /** Encode a solid-gray w×h image to `fmt` bytes in memory. */
  private def fixture(w: Int, h: Int, gray: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
    out.toByteArray
  }

  test("PNG and BMP payloads decode to real dimensions and mean luminance") {
    val s = spark
    import s.implicits._
    val png = fixture(12, 7, gray = 100, "png")
    val bmp = fixture(33, 9, gray = 200, "bmp")
    val junk = "definitely not an image payload".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, bmp), (3L, junk)).toDF("doc_id", "payload")
    val got = MultimodalOps.decodeFeatures(df).collect()
      .map(f => f.doc_id -> f).toMap

    val p = got(1L)
    assert(p.decoded && p.width == 12 && p.height == 7)
    assert(math.abs(p.brightness - 100.0 / 255.0) < 1e-9,
      s"png mean luminance ${p.brightness} != 100/255")
    assert(p.nbytes == png.length)

    val b = got(2L)
    assert(b.decoded && b.width == 33 && b.height == 9)
    assert(math.abs(b.brightness - 200.0 / 255.0) < 1e-9,
      s"bmp mean luminance ${b.brightness} != 200/255")

    // undecodable payload: total function, flagged fallback
    val j = got(3L)
    assert(!j.decoded && j.nbytes == junk.length &&
      j.width >= 64 && j.brightness >= 0.0 && j.brightness <= 1.0)
  }

  test("non-uniform image: luminance is the Rec.601 pixel mean, not a byte hash") {
    val s = spark
    import s.implicits._
    // left half black, right half pure red -> mean luma = 0.299/2
    val img = new java.awt.image.BufferedImage(
      10, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 10)
      img.setRGB(x, y, if (x < 5) 0x000000 else 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val df = Seq((1L, out.toByteArray)).toDF("doc_id", "payload")
    val f = MultimodalOps.decodeFeatures(df).collect().head
    assert(f.decoded && f.width == 10 && f.height == 4)
    assert(math.abs(f.brightness - 0.299 / 2) < 1e-9,
      s"expected ${0.299 / 2}, got ${f.brightness}")
  }

  test("truncated image payload falls back instead of failing the job") {
    val s = spark
    import s.implicits._
    val png = fixture(16, 16, gray = 50, "png")
    val truncated = png.take(png.length / 3) // valid magic, broken body
    val df = Seq((1L, truncated)).toDF("doc_id", "payload")
    val f = MultimodalOps.decodeFeatures(df).collect().head
    assert(!f.decoded, "truncated png must route to the fallback, not throw")
  }

  test("decompression-bomb header (60000x60000 declared) is rejected before pixel allocation") {
    val s = spark
    import s.implicits._
    // Hand-built PNG prelude: signature + a VALID IHDR chunk declaring
    // 60000×60000 (3.6 G pixels ≈ 14 GB decoded) and nothing else. The
    // JDK reader happily reports those dimensions from the header; a
    // guard that fully decodes before checking would OOM the executor.
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    val ihdr = new java.io.ByteArrayOutputStream()
    val ih = new java.io.DataOutputStream(ihdr)
    ih.writeBytes("IHDR")
    ih.writeInt(60000); ih.writeInt(60000) // width, height
    ih.write(8); ih.write(6); ih.write(0); ih.write(0); ih.write(0)
    out.writeInt(13) // IHDR data length
    val body = ihdr.toByteArray
    out.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    out.writeInt(crc.getValue.toInt)
    val bomb = bos.toByteArray
    val t0 = System.nanoTime()
    val f = MultimodalOps.decodeFeatures(
      Seq((1L, bomb)).toDF("doc_id", "payload")).collect().head
    val sec = (System.nanoTime() - t0) / 1e9
    assert(!f.decoded, "bomb header must route to the quarantine fallback")
    assert(sec < 30.0, s"bomb rejection took ${sec}s - was it fully decoded?")
  }

  test("mixed-payload partition keeps decode partition-parallel (no shuffle)") {
    val s = spark
    import s.implicits._
    val png = fixture(4, 4, gray = 10, "png")
    val df = (1L to 64L).map(i =>
      (i, if (i % 2 == 0) png else s"blob $i".getBytes("UTF-8")))
      .toDF("doc_id", "payload").repartition(8)
    val ds = MultimodalOps.decodeFeatures(df)
    val plan = ds.queryExecution.executedPlan.toString
    // exactly ONE exchange: the repartition(8) this test itself added —
    // decode must not contribute another
    val exchanges = "(?i)exchange".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"decode introduced a shuffle beyond the test's own repartition:\n$plan")
    val rows = ds.collect()
    assert(rows.count(_.decoded) == 32 && rows.count(!_.decoded) == 32)
  }
}
