package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Codec
import graft.world.World

/** Multimodal-column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches (the Scala analog of `mapInPandas`: one iterator pass per
  * partition, decode amortized across the batch, no per-row JVM/py
  * round-trips to model).
  *
  * DECODE IS A STUB: the container has no image/audio codecs beyond
  * javax.imageio, so `decodeStub` deterministically fakes the decode
  * (interprets the payload's first band as f32 pixels — which is exactly
  * right for this repo's synthetic tiles, and stands in for jpeg/mp3
  * decode in production). The Spark-side plumbing — schema, partition
  * batching, feature extraction shape — is real and tested.
  */
object Multimodal {

  final case class Media(image_id: String, bytes: Array[Byte], w: Int,
      h: Int, fmt: String, caption: String, phash: Long)

  final case class MediaFeatures(image_id: String, n_bytes: Int,
      mean_px: Double, max_px: Double, thumb_hash: Long, n_frames: Int)

  /** Synthetic media table (reuses the world's tile payloads). */
  def syntheticMedia(s: SparkSession): DataFrame =
    World.tilesDF(s, World.tiny).drop("tile_id")

  /** STUB decode: payload -> single-band float pixels. In production
    * this is the jpeg/png/webp decode call. */
  private def decodeStub(m: Media): Array[Float] =
    Codec.decodeF32Band(m.bytes, m.w * m.h, band = 0)

  /** Frame-sample stub for "video" payloads: every k-th row block. */
  private def frameSampleStub(px: Array[Float], w: Int, k: Int): Int =
    (px.length / w + k - 1) / k

  /** Per-partition batched decode + feature extraction. */
  def features(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[Media].mapPartitions { rows =>
      rows.map { m =>
        val px = decodeStub(m)
        var sum = 0.0
        var mx = Double.MinValue
        var i = 0
        while (i < px.length) {
          sum += px(i)
          if (px(i) > mx) mx = px(i)
          i += 1
        }
        MediaFeatures(m.image_id, m.bytes.length,
          sum / px.length, mx,
          Codec.phash(px, m.w, m.h), // 8x8 thumbnail hash = resize stub
          frameSampleStub(px, m.w, k = 4))
      }
    }.toDF()
  }
}
