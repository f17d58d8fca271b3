package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

case class MediaFeatures(doc_id: Long, nbytes: Int, width: Int, height: Int,
                         brightness: Double)

/** Batch-decode plumbing for multimodal payloads: `mapPartitions` with
  * a per-partition codec lifecycle (open once, decode many) — the
  * JVM analogue of a `mapInPandas` batched UDF, and the shape a real
  * codec integration drops into. The codec itself is a STUB (no
  * image/audio libraries ship in this container): `FakeCodec` derives
  * deterministic pseudo-features from the bytes. Swapping `FakeCodec`
  * for a JNI/ffmpeg binding changes nothing about the plan —
  * partition-parallel, no shuffle, no driver collection.
  */
object MultimodalOps {
  implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB: deterministic "decoder". Real impl would parse the codec
    * header; this folds bytes into stable pseudo-dimensions. */
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

  /** Decode features for a DataFrame with (doc_id LONG, payload BINARY). */
  def decodeFeatures(df: DataFrame): Dataset[MediaFeatures] =
    df.selectExpr("doc_id", "payload").mapPartitions { rows =>
      val codec = FakeCodec.open() // once per partition, not per row
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, b) = codec.decode(payload)
        MediaFeatures(r.getLong(0), payload.length, w, h, b)
      }
    }
}
