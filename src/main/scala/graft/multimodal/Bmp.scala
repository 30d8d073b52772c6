package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM BMP codec (Windows `BITMAPFILEHEADER` +
  * `BITMAPINFOHEADER`, 24-bpp uncompressed BI_RGB) — the uncompressed
  * row-padded image lane of the codec ladder: no entropy coder, but the
  * container details real corpora trip on are all here and all verified:
  *
  *  - rows are stored BGR (not RGB) and padded to a 4-byte boundary;
  *  - a POSITIVE height means BOTTOM-UP row order (the BMP default),
  *    a NEGATIVE height means top-down — the fixture emits both, and the
  *    decoder resolves the orientation explicitly;
  *  - the pixel-array offset is a header FIELD (offset 10), not a
  *    constant — optional palette/ICC blocks legally sit between the DIB
  *    header and the pixels, so the decoder honors the field (bounded);
  *  - forged headers (claimed dims beyond the payload, absurd pixel
  *    counts, non-BI_RGB compression, bpp ≠ 24) DROP the row — the
  *    per-codec coerce-to-null rule, spec-tested.
  *
  * Decode is row-local `mapPartitions` like every codec lane: payload
  * bytes never leave the executor, features are a handful of numbers. */
object Bmp {

  case class BmpImage(id: Long, media: Array[Byte])
  case class BmpFeatures(id: Long, width: Int, height: Int, top_down: Boolean,
                         n_pixels: Long, mean_r: Double, mean_g: Double,
                         mean_b: Double)

  /** Total decoded pixels a payload may claim (bomb guard — a 54-byte
    * header must not allocate gigabytes). */
  private val MaxPixels = 1 << 24

  private def putLE32(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = v.toByte
    b(at + 1) = (v >>> 8).toByte
    b(at + 2) = (v >>> 16).toByte
    b(at + 3) = (v >>> 24).toByte
  }
  private def le32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  /** Deterministic BMP fixture: dims (6 + id % 7) × (3 + id % 6), every
    * third image TOP-DOWN (negative height), pixel (x, y) = the shared
    * generation formula family (r = (id+3x+7y)%256, g = (2id+x)%256,
    * b = (id+y)%256) — so the oracle replays features from the formula
    * while the Spark path really encodes and re-parses the container. */
  def syntheticBmp(ids: Dataset[Long]): Dataset[BmpImage] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (6 + id % 7).toInt
      val h = (3 + id % 6).toInt
      val topDown = id % 3 == 0
      val rowSize = (w * 3 + 3) & ~3
      val pixelOff = 14 + 40
      val buf = new Array[Byte](pixelOff + rowSize * h)
      buf(0) = 'B'; buf(1) = 'M'
      putLE32(buf, 2, buf.length)
      putLE32(buf, 10, pixelOff)
      putLE32(buf, 14, 40) // BITMAPINFOHEADER
      putLE32(buf, 18, w)
      putLE32(buf, 22, if (topDown) -h else h)
      buf(26) = 1 // planes (LE16)
      buf(28) = 24 // bpp (LE16)
      putLE32(buf, 30, 0) // BI_RGB
      putLE32(buf, 34, rowSize * h)
      var j = 0
      while (j < h) {
        val y = if (topDown) j else h - 1 - j // stored row j ↔ logical y
        var x = 0
        var p = pixelOff + j * rowSize
        while (x < w) {
          buf(p) = ((id + y) % 256).toByte // B
          buf(p + 1) = ((2 * id + x) % 256).toByte // G
          buf(p + 2) = ((id + 3 * x + 7 * y) % 256).toByte // R
          p += 3; x += 1
        }
        j += 1
      }
      BmpImage(id, buf)
    }
  }

  /** Router predicate: "BM" is only a 2-byte magic, weak enough to
    * collide with text payloads — require the BITMAPINFOHEADER size field
    * (40, containing NUL bytes no text can carry) before claiming the
    * kind, so the opaque lane never loses a row to a false BMP match. */
  private[multimodal] def looksLikeBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B' && b(1) == 'M' && le32(b, 14) == 40

  def decodeBmp(media: Dataset[BmpImage]): Dataset[BmpFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Per-row entry point (shared with the magic-byte router). */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[BmpFeatures] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    val w = le32(b, 18)
    val rawH = le32(b, 22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0) return None
    if (w <= 0 || h <= 0 || rawH == Int.MinValue) return None
    if (w.toLong * h > MaxPixels) return None // bomb guard
    val rowSize = ((w.toLong * 3 + 3) & ~3L)
    if (pixelOff < 14 + dibSize || pixelOff > b.length) return None
    if (b.length - pixelOff < rowSize * h) return None // forged-dims guard
    var sr = 0L; var sg = 0L; var sb = 0L
    var j = 0
    while (j < h) {
      var p = pixelOff + (j * rowSize).toInt
      var x = 0
      while (x < w) {
        sb += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sr += (b(p + 2) & 0xff)
        p += 3; x += 1
      }
      j += 1
    }
    val n = w.toLong * h
    Some(BmpFeatures(id, w, h, topDown, n,
      sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }
}
