package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM WebP container metadata codec — the RIFF-based image
  * container (reference's multimodal decode surface; RIFF walk shared in
  * spirit with [[Video]]'s AVI lane). All three top-level bitstream forms
  * are parsed, each with the header subtlety real WebP corpora hit:
  *
  *  - `VP8 ` (lossy): a 3-byte frame tag, then the keyframe START CODE
  *    0x9d 0x01 0x2a, then 14-BIT width/height packed in LE16s whose top
  *    2 bits are rescale hints — masking with 0x3fff is the bug every
  *    quick reader writes as `le16 & 0xffff`;
  *  - `VP8L` (lossless): signature byte 0x2f, then a little-endian BIT
  *    stream: 14 bits (width−1), 14 bits (height−1), 1 alpha bit, 3
  *    version bits that MUST be zero — dims are stored minus-one (the
  *    0 ⇒ 16384 twin of ICO's 0 ⇒ 256 convention);
  *  - `VP8X` (extended): a 10-byte header with 24-bit (canvas−1) dims and
  *    a flag byte, followed by more chunks — the decoder must SKIP
  *    unknown chunks (XMP/ICCP/EXIF) to reach the actual frame, honor
  *    the RIFF odd-size PAD BYTE while doing so, and cross-check the
  *    inner frame dims against the canvas (a forged canvas drops).
  *
  * Forgeries/bombs drop (coerce-to-null): RIFF size lies, truncated
  * chunks, wrong start codes, nonzero VP8L version, canvas/frame
  * mismatch. Decode is row-local `mapPartitions`; bytes stay on the
  * executor.
  */
object Webp {

  case class WebpFile(id: Long, media: Array[Byte])
  case class WebpMeta(id: Long, kind: String, width: Int, height: Int,
                      has_alpha: Boolean, n_chunks: Int)

  /** Fixture formulas shared with the oracle: kind = id mod 3
    * (vp8/vp8l/vp8x), w = 16 + id % 31, h = 9 + 2id % 17, alpha on even
    * ids for the alpha-capable kinds, a skippable odd-sized XMP chunk on
    * vp8x files with id ≡ 0 (mod 4). */
  def shape(id: Long): (String, Int, Int, Boolean, Int) = {
    val kind = (id % 3) match {
      case 0 => "vp8"; case 1 => "vp8l"; case _ => "vp8x"
    }
    val w = (16 + id % 31).toInt
    val h = (9 + (2 * id) % 17).toInt
    val alpha = kind != "vp8" && id % 2 == 0
    val n = kind match {
      case "vp8" | "vp8l" => 1
      case _ => if (id % 4 == 0) 3 else 2
    }
    (kind, w, h, alpha, n)
  }

  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def le24(b: Array[Byte], at: Int): Int =
    le16(b, at) | ((b(at + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], at: Int): Int =
    le16(b, at) | (le16(b, at + 2) << 16)
  private def putLE16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def putLE24(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    putLE16(o, v & 0xffff); o.write((v >>> 16) & 0xff)
  }
  private def putLE32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    putLE16(o, v & 0xffff); putLE16(o, v >>> 16)
  }
  private def fourCC(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def syntheticWebp(ids: Dataset[Long]): Dataset[WebpFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => WebpFile(id, encodeOne(id)))
  }

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(8 + payload.length + 1)
    o.write(cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    putLE32(o, payload.length)
    o.write(payload)
    if (payload.length % 2 == 1) o.write(0) // RIFF pad byte
    o.toByteArray
  }

  private def vp8Payload(id: Long, w: Int, h: Int): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(0); o.write(0); o.write(0)            // frame tag (keyframe)
    o.write(0x9d); o.write(0x01); o.write(0x2a)   // start code
    putLE16(o, w)                                 // 14-bit dims, scale 0
    putLE16(o, h)
    (0 until (4 + (id % 3)).toInt).foreach(_ => o.write(0x5a)) // body filler
    o.toByteArray
  }

  private def vp8lPayload(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(0x2f)
    val bits = (w - 1) | ((h - 1) << 14) | ((if (alpha) 1 else 0) << 28)
    putLE32(o, bits) // version bits 29..31 stay zero
    o.toByteArray    // 5 bytes — deliberately ODD so the pad byte fires
  }

  def encodeOne(id: Long): Array[Byte] = {
    val (kind, w, h, alpha, _) = shape(id)
    val body = new java.io.ByteArrayOutputStream()
    kind match {
      case "vp8"  => body.write(chunk("VP8 ", vp8Payload(id, w, h)))
      case "vp8l" => body.write(chunk("VP8L", vp8lPayload(w, h, alpha)))
      case _ =>
        val x = new java.io.ByteArrayOutputStream(10)
        x.write(if (alpha) 0x10 else 0x00) // flag byte (ALPHA bit)
        x.write(0); x.write(0); x.write(0) // reserved
        putLE24(x, w - 1); putLE24(x, h - 1)
        body.write(chunk("VP8X", x.toByteArray))
        if (id % 4 == 0) // odd-sized unknown chunk BETWEEN header and frame
          body.write(chunk("XMP ", Array[Byte]('x', 'm', 'l')))
        body.write(chunk("VP8 ", vp8Payload(id, w, h)))
    }
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream(12 + payload.length)
    out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    putLE32(out, 4 + payload.length)
    out.write("WEBP".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(payload)
    out.toByteArray
  }

  /** Router predicate: RIFF....WEBP with a consistent size field. */
  private[multimodal] def looksLikeWebp(b: Array[Byte]): Boolean =
    b.length >= 16 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "WEBP" &&
      le32(b, 4).toLong + 8 == b.length

  def decodeWebp(media: Dataset[WebpFile]): Dataset[WebpMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Parse the VP8 keyframe header: start code + 14-bit masked dims. */
  private def frameDimsVp8(p: Array[Byte]): Option[(Int, Int)] =
    if (p.length < 10 || (p(3) & 0xff) != 0x9d || (p(4) & 0xff) != 0x01 ||
        (p(5) & 0xff) != 0x2a) None
    else {
      val w = le16(p, 6) & 0x3fff
      val h = le16(p, 8) & 0x3fff
      if (w <= 0 || h <= 0) None else Some((w, h))
    }

  private def frameDimsVp8l(p: Array[Byte]): Option[(Int, Int, Boolean)] =
    if (p.length < 5 || (p(0) & 0xff) != 0x2f) None
    else {
      val bits = le32(p, 1)
      if (((bits >>> 29) & 0x7) != 0) None // version must be 0
      else Some(((bits & 0x3fff) + 1, ((bits >>> 14) & 0x3fff) + 1,
        ((bits >>> 28) & 1) == 1))
    }

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[WebpMeta] = {
    if (!looksLikeWebp(b)) return None
    // RIFF chunk walk with pad-byte advance; truncation drops the file
    var at = 12
    val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    while (at + 8 <= b.length) {
      val cc = fourCC(b, at)
      val size = le32(b, at + 4)
      if (size < 0 || at + 8 + size.toLong > b.length) return None
      chunks += ((cc, at + 8, size))
      at += 8 + size + (size & 1)
    }
    if (at != b.length || chunks.isEmpty) return None
    val (cc0, off0, sz0) = chunks.head
    def payload(off: Int, sz: Int) = java.util.Arrays.copyOfRange(b, off, off + sz)
    cc0 match {
      case "VP8 " if chunks.length == 1 =>
        frameDimsVp8(payload(off0, sz0)).map { case (w, h) =>
          WebpMeta(id, "vp8", w, h, has_alpha = false, 1)
        }
      case "VP8L" if chunks.length == 1 =>
        frameDimsVp8l(payload(off0, sz0)).map { case (w, h, a) =>
          WebpMeta(id, "vp8l", w, h, a, 1)
        }
      case "VP8X" if sz0 == 10 =>
        val p = payload(off0, sz0)
        if (p(1) != 0 || p(2) != 0 || p(3) != 0) return None // reserved
        val alpha = (p(0) & 0x10) != 0
        val cw = le24(p, 4) + 1
        val ch = le24(p, 7) + 1
        // skip unknown chunks to the frame; canvas must match its dims
        val frame = chunks.tail.collectFirst {
          case ("VP8 ", o, s) => frameDimsVp8(payload(o, s))
          case ("VP8L", o, s) => frameDimsVp8l(payload(o, s)).map(t => (t._1, t._2))
        }.flatten
        frame match {
          case Some((fw, fh)) if fw == cw && fh == ch =>
            Some(WebpMeta(id, "vp8x", cw, ch, alpha, chunks.length))
          case _ => None
        }
      case _ => None
    }
  }
}
