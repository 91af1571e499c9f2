package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: an opaque binary payload + typed metadata. At scale the
  * payload column stays columnar (Parquet binary) and is only ever
  * processed partition-local — no shuffle touches the bytes. */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted per-media features (decode output). */
case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                     frame_count: Long, sample_sum: Long, sample_hash: Long)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded partition-locally via a typed
  * `Dataset.mapPartitions` (the Scala analogue of `mapInPandas` batches).
  *
  * The codec itself is a STUB — no image/audio libraries exist in this
  * container — replaced by a deterministic fake: "frames" are 64-byte
  * strides and "features" are a sum + rolling hash over the stride-sampled
  * bytes. The Spark-side plumbing is real and load-bearing: binary-column
  * schema, case-class Encoders, per-partition batch iteration, and scalar
  * feature output that downstream relational ops consume.
  */
object Multimodal {

  val FrameStride = 64

  /** Wrap documents as media rows: payload = UTF-8 bytes of the text
    * (stand-in for real image/audio bytes), media type cycles by id. */
  def toMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** STUB decode: real impl would dispatch per media_type to a codec
    * (JPEG decode / PCM frames / video keyframes) inside the same
    * mapPartitions loop. Deterministic fake keeps the dataflow testable. */
  def decodeStub(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        var sum = 0L; var h = 0L; var i = 0
        while (i < n) { // sample one byte per frame stride
          val b = (m.payload(i) & 0xff).toLong
          sum += b
          h = (h * 31 + b) % TextKit.P
          i += FrameStride
        }
        MediaMeta(m.doc_id, m.media_type, n.toLong,
          frame_count = (n.toLong + FrameStride - 1) / FrameStride,
          sample_sum = sum, sample_hash = h)
      }
    }
  }
}
