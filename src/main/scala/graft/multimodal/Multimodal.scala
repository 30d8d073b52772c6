package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * The decode step is a STUB — the container has no image/audio codecs — but
  * everything Spark-side is real: schema, per-partition batching, the
  * mapPartitions signature a native decoder would slot into, and the
  * partitioning advice (media rows are wide; keep
  * `spark.sql.files.maxPartitionBytes` at default 128 MB so a partition of
  * ~100 KB payloads stays ~1000 rows, and never collect payloads).
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int)
  case class MediaFeatures(id: Long, n_bytes: Int, format: String,
                           fingerprint: Long, brightness: Double)

  /** Wrap a text corpus as a binary media table (UTF-8 payload standing in
    * for encoded media) with a typed metadata struct. */
  def attachBinary(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("id"),
      encode(col(text), "UTF-8").as("media"),
      struct(
        lit("utf8").as("format"),
        length(encode(col(text), "UTF-8")).as("n_bytes"),
        lit(0).as("width"),
        lit(0).as("height")).as("meta"))

  /** STUB decoder: stands in for an image/audio decode + feature extraction.
    * A real implementation would decode `media` per partition (reusing one
    * native decoder instance per partition, not per row); the fake derives
    * deterministic features from the raw bytes so the plumbing is testable.
    */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder" init would go here (native lib handle)
      rows.map { r =>
        val bytes = r.media
        var fp = 0L
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          fp = (fp * 31 + (bytes(i) & 0xff)) % 1000000007L
          sum += (bytes(i) & 0xff)
          i += 1
        }
        val brightness = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        MediaFeatures(r.id, bytes.length, r.format, fp, brightness)
      }
    }
  }
}
