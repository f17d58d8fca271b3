package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

case class MediaFeatures(doc_id: Long, nbytes: Int, width: Int, height: Int,
                         brightness: Double, decoded: Boolean)

/** Batch-decode plumbing for multimodal payloads: `mapPartitions` with
  * a per-partition codec lifecycle (open once, decode many) — the
  * JVM analogue of a `mapInPandas` batched UDF. Partition-parallel,
  * no shuffle, no driver collection; a different codec binding changes
  * nothing about the plan.
  *
  * The image path is REAL since round 10: payloads that parse with the
  * JDK's built-in ImageIO readers (PNG, BMP, GIF, JPEG — pure-JVM, no
  * native codecs needed) yield actual pixel dimensions and mean
  * luminance (`decoded = true`). Video/audio payloads and arbitrary
  * byte blobs still fall back to the deterministic pseudo-feature stub
  * (`decoded = false`) — those codecs genuinely don't ship in this
  * container, and a fallback that never throws keeps the operator
  * total over a crawl's dirty payload mix (a 100 TB decode job that
  * dies on the first truncated file is useless; route `decoded=false`
  * rows to a quarantine sink instead).
  */
object MultimodalOps {
  implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Real image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG).
    * Some((w, h, meanLuma01)) when the payload parses as an image;
    * None for anything else (including truncated/corrupt files —
    * decode must be total over crawl data). Luminance is the Rec.601
    * weighting over all pixels, normalized to [0, 1]. */
  private[graft] object ImageIoCodec {
    def open(): ImageIoCodec.type = {
      // no temp-file cache: payloads are in-memory byte arrays and
      // executor-local disk writes per decode would dominate
      javax.imageio.ImageIO.setUseCache(false)
      this
    }
    /** Decompression-bomb cap: a tiny file can declare e.g. 60000×60000
      * pixels and allocate gigabytes on full decode. 64 MP (~256 MB of
      * INT_ARGB) is far above any legitimate crawl image and far below
      * executor heap. Dimensions are peeked from the stream HEADER via
      * ImageReader before any pixel allocation. */
    private val MaxPixels = 64L * 1024 * 1024

    /** Header-only dimension read; None when no reader claims the
      * payload (non-image bytes → fallback path). */
    private def peekDims(in: javax.imageio.stream.ImageInputStream): Option[(Int, Int)] = {
      // Iterate ALL claiming readers, like ImageIO.read's selection
      // loop: an ambiguous payload whose first reader fails header
      // parse may still decode under the next one — returning None on
      // the first failure would quarantine a decodable image.
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      var dims: Option[(Int, Int)] = None
      while (dims.isEmpty && readers.hasNext) {
        val reader = readers.next()
        try {
          reader.setInput(in, true, true)
          dims = Some((reader.getWidth(0), reader.getHeight(0)))
        } catch {
          case scala.util.control.NonFatal(_) =>
            try in.seek(0) catch { case scala.util.control.NonFatal(_) => () }
        } finally reader.dispose()
      }
      dims
    }

    def decode(payload: Array[Byte]): Option[(Int, Int, Double)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val dims = try peekDims(iis) finally iis.close()
        dims match {
          case None => None
          case Some((pw, ph)) if pw.toLong * ph > MaxPixels || pw <= 0 || ph <= 0 =>
            None // bomb or corrupt header: quarantine via the fallback path
          case Some(_) => decodePixels(payload)
        }
      } catch {
        // OOM / interrupts / fatal JVM errors must propagate — only
        // data-shaped failures (corrupt bytes, codec bugs) fall back
        case scala.util.control.NonFatal(_) => None
      }

    private def decodePixels(payload: Array[Byte]): Option[(Int, Int, Double)] = {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, sum / (w.toDouble * h) / 255.0))
        }
    }
  }

  /** STUB for the codecs the container lacks (video/audio): folds the
    * bytes into stable pseudo-dimensions so pipelines over mixed
    * payloads stay deterministic and testable end-to-end. */
  private object FakeCodec {
    def open(): FakeCodec.type = this // lifecycle stand-in
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      val pos = math.abs(h)
      (64 + (pos % 1216).toInt, 64 + ((pos / 1216) % 656).toInt,
        (pos % 256) / 255.0)
    }
  }

  /** Decode features for a DataFrame with (doc_id LONG, payload BINARY).
    * Real pixel stats where ImageIO can read the payload, pseudo-stats
    * (flagged `decoded = false`) everywhere else. */
  def decodeFeatures(df: DataFrame): Dataset[MediaFeatures] =
    df.selectExpr("doc_id", "payload").mapPartitions { rows =>
      val imgCodec = ImageIoCodec.open() // once per partition, not per row
      val fallback = FakeCodec.open()
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        imgCodec.decode(payload) match {
          case Some((w, h, b)) =>
            MediaFeatures(r.getLong(0), payload.length, w, h, b, decoded = true)
          case None =>
            val (w, h, b) = fallback.decode(payload)
            MediaFeatures(r.getLong(0), payload.length, w, h, b, decoded = false)
        }
      }
    }
}
