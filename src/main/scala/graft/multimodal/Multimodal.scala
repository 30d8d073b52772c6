package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * Two decode paths: [[decodePpm]] is a REAL pure-JVM binary-PPM (P6)
  * decoder — header parse + per-channel payload fold — proving the
  * partition-loop decode stage end-to-end with no native codec.
  * [[decodeFeatures]] remains the stand-in for formats that need a native
  * library (JPEG/FLAC/H.264 — not in this container); its Spark-side shape
  * (schema, per-partition batching, mapPartitions signature) is identical.
  * Partitioning advice: media rows are wide; keep
  * `spark.sql.files.maxPartitionBytes` at default 128 MB so a partition of
  * ~100 KB payloads stays ~1000 rows, and never collect payloads.
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

  case class PpmImage(id: Long, media: Array[Byte])
  case class PpmFeatures(id: Long, width: Int, height: Int, n_pixels: Long,
                         mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic binary-PPM (P6) fixture: header `P6\n{w} {h}\n255\n`
    * followed by w·h RGB triples, all derived from the id — so an oracle can
    * replay the expected features from the generation formula while the
    * Spark path actually round-trips encode → parse. */
  def syntheticPpm(ids: Dataset[Long]): Dataset[PpmImage] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val buf = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, buf, 0, header.length)
      var p = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          buf(p) = ((id + 3 * x + 7 * y) % 256).toByte
          buf(p + 1) = ((2 * id + x) % 256).toByte
          buf(p + 2) = ((id + y) % 256).toByte
          p += 3; x += 1
        }
        y += 1
      }
      PpmImage(id, buf)
    }
  }

  /** REAL pure-JVM decoder for binary PPM (P6): parses the header (magic,
    * `#` comments, whitespace-separated width/height/maxval), then folds the
    * RGB payload into per-channel means — the feature-extraction stage of an
    * image pipeline, with no native codec needed. Malformed payloads are
    * dropped (coerce-to-null engine rule; a production variant would route
    * them to a quarantine sink). One decoder loop per partition, payload
    * bytes never leave the executor. */
  def decodePpm(media: Dataset[PpmImage]): Dataset[PpmFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val b = r.media
        var i = 0
        // token reader: skips whitespace and # comments between header fields
        def nextToken(): String = {
          while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' || b(i) == '#')) {
            if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
            else i += 1
          }
          val s = i
          while (i < b.length && b(i) != ' ' && b(i) != '\n' && b(i) != '\r' && b(i) != '\t') i += 1
          new String(b, s, i - s, java.nio.charset.StandardCharsets.US_ASCII)
        }
        try {
          if (nextToken() != "P6") None
          else {
            val w = nextToken().toInt
            val h = nextToken().toInt
            val maxval = nextToken().toInt
            i += 1 // single whitespace byte after maxval per the P6 spec
            val n = w.toLong * h
            if (maxval != 255 || w <= 0 || h <= 0 || b.length - i < n * 3) None
            else {
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = i
              val end = i + n.toInt * 3
              while (p < end) {
                sr += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sb += (b(p + 2) & 0xff)
                p += 3
              }
              Some(PpmFeatures(r.id, w, h, n,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
            }
          }
        } catch { case _: NumberFormatException => None }
      }
    }
  }

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
