package graft.multimodal

import org.apache.spark.sql.Dataset

/** TrueType/sfnt FONT TABLE walk (the OpenType spec's sfnt wrapper) —
  * fonts are first-class corpus payloads (web crawls are full of .ttf;
  * rendering pipelines index them by metrics). Real structure, real
  * traps, glyph outlines stay out (the codec-ladder discipline):
  *
  *  - offset table: sfntVersion 0x00010000, then numTables plus the
  *    binary-search triplet searchRange = 16·2^⌊log₂ n⌋, entrySelector =
  *    ⌊log₂ n⌋, rangeShift = 16n − searchRange — all three VERIFIED
  *    (they're redundant with numTables, which is exactly why forgers
  *    get them wrong);
  *  - table records (tag, checkSum, offset, length) must be tag-sorted
  *    (the spec's binary-search contract) and in-bounds;
  *  - per-table CHECKSUMS are verified: sum of big-endian u32s over the
  *    zero-padded table mod 2³² — and for `head` the checkSumAdjustment
  *    field (bytes 8-11 of the table) is treated as ZERO during the sum,
  *    THE classic sfnt implementation trap;
  *  - `head` must carry magicNumber 0x5F0F3CF5; metrics (unitsPerEm,
  *    xMin/yMin/xMax/yMax) and `maxp`'s numGlyphs are the features.
  *
  * Any violation — bad version, wrong search triplet, unsorted tags,
  * out-of-bounds or checksum-failing table, missing head/maxp, bad
  * magic — drops the row (coerce-to-null). Decode is row-local
  * `mapPartitions` like every codec lane. */
object Ttf {

  case class TtfFile(id: Long, media: Array[Byte])
  case class TtfFeatures(id: Long, n_tables: Int, units_per_em: Int,
                         n_glyphs: Int, x_min: Int, y_min: Int,
                         x_max: Int, y_max: Int)

  private val MaxTables = 64

  /** Fixture formulas shared with the oracle. */
  def shape(id: Long): (Int, Int, Int, Int, Int, Int, Int) = {
    val nTables = (2 + id % 2).toInt
    val upem = (1000 + 24 * (id % 5)).toInt
    val nGlyphs = (100 + id % 50).toInt
    val xMin = -((id % 100).toInt)
    val yMin = -((id % 80).toInt)
    val xMax = 1000 + (id % 200).toInt
    val yMax = 900 + (id % 150).toInt
    (nTables, upem, nGlyphs, xMin, yMin, xMax, yMax)
  }

  def syntheticTtf(ids: Dataset[Long]): Dataset[TtfFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => TtfFile(id, encodeOne(id)))
  }

  private def u16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >>> 8) & 0xff); o.write(v & 0xff)
  }
  private def u32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >>> 24) & 0xff).toInt); o.write(((v >>> 16) & 0xff).toInt)
    o.write(((v >>> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }

  /** Table checksum: BE u32 sum over the padded table region. The pad
    * bytes are READ, not assumed zero — the spec obliges writers to pad
    * with zeros, and a reader that skips them would silently accept a
    * corrupted pad (caught by the flip-last-byte spec case). */
  private def checksum(b: Array[Byte], from: Int, len: Int,
                       zeroAt: Int = -1): Long = {
    var sum = 0L
    var i = 0
    val padded = (len + 3) & ~3
    while (i < padded) {
      var w = 0L
      var j = 0
      while (j < 4) {
        val at = from + i + j
        val raw = if (at < b.length) b(at) & 0xffL else 0L
        val v = if (zeroAt >= 0 && i + j >= zeroAt && i + j < zeroAt + 4) 0L
                else raw
        w = (w << 8) | v
        j += 1
      }
      sum = (sum + w) & 0xffffffffL
      i += 4
    }
    sum
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val (nTables, upem, nGlyphs, xMin, yMin, xMax, yMax) = shape(id)
    def table(tag: String): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      tag match {
        case "head" =>
          u32(o, 0x00010000L) // version
          u32(o, 0x00010000L) // fontRevision
          u32(o, 0L) // checkSumAdjustment (left 0; zeroed in sums anyway)
          u32(o, 0x5F0F3CF5L) // magicNumber
          u16(o, 0) // flags
          u16(o, upem)
          (0 until 16).foreach(_ => o.write(0)) // created + modified
          u16(o, xMin & 0xffff); u16(o, yMin & 0xffff)
          u16(o, xMax & 0xffff); u16(o, yMax & 0xffff)
          u16(o, 0); u16(o, 0) // macStyle, lowestRecPPEM
          u16(o, 2); u16(o, 0); u16(o, 0) // directionHint, locFmt, glyphFmt
        case "maxp" =>
          u32(o, 0x00010000L)
          u16(o, nGlyphs)
          (0 until 13).foreach(_ => u16(o, 0)) // maxima fields
        case "name" =>
          val s = s"graft-font-$id"
          u16(o, 0); u16(o, 1); u16(o, 6 + 12) // format, count, stringOffset
          u16(o, 1); u16(o, 0); u16(o, 0); u16(o, 4) // platform/enc/lang/name
          u16(o, s.length); u16(o, 0)
          s.foreach(c => o.write(c.toInt))
      }
      o.toByteArray
    }
    val tags = (if (nTables == 3) Seq("head", "maxp", "name")
                else Seq("head", "maxp")).sorted
    val payloads = tags.map(t => t -> table(t))
    val headerLen = 12 + 16 * tags.length
    // directory with real offsets/lengths/checksums over padded payloads
    val out = new java.io.ByteArrayOutputStream()
    u32(out, 0x00010000L)
    val log2 = 31 - Integer.numberOfLeadingZeros(tags.length)
    u16(out, tags.length)
    u16(out, 16 * (1 << log2)) // searchRange
    u16(out, log2) // entrySelector
    u16(out, 16 * tags.length - 16 * (1 << log2)) // rangeShift
    var off = headerLen
    val placed = payloads.map { case (t, p) =>
      val at = off
      off += (p.length + 3) & ~3
      (t, p, at)
    }
    val total = off
    val body = new Array[Byte](total)
    placed.foreach { case (_, p, at) => System.arraycopy(p, 0, body, at, p.length) }
    placed.foreach { case (t, p, at) =>
      t.foreach(c => out.write(c.toInt))
      u32(out, checksum(body, at, p.length,
        zeroAt = if (t == "head") 8 else -1))
      u32(out, at.toLong)
      u32(out, p.length.toLong)
    }
    val header = out.toByteArray
    System.arraycopy(header, 0, body, 0, header.length)
    body
  }

  /** Router predicate: sfntVersion 0x00010000 + a sane table count. */
  private[multimodal] def looksLikeTtf(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 0 && b(1) == 1 && b(2) == 0 && b(3) == 0 &&
      (((b(4) & 0xff) << 8) | (b(5) & 0xff)) > 0

  def decodeTtf(media: Dataset[TtfFile]): Dataset[TtfFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private def be16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def s16(b: Array[Byte], at: Int): Int = be16(b, at).toShort.toInt
  private def be32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[TtfFeatures] =
    scala.util.Try(decodeOneUnsafe(id, b)).toOption.flatten

  private def decodeOneUnsafe(id: Long, b: Array[Byte]): Option[TtfFeatures] = {
    if (b.length < 12 || be32(b, 0) != 0x00010000L) return None
    val n = be16(b, 4)
    if (n < 1 || n > MaxTables) return None
    // the binary-search triplet is redundant with n — verify all three
    val log2 = 31 - Integer.numberOfLeadingZeros(n)
    if (be16(b, 6) != 16 * (1 << log2)) return None // searchRange
    if (be16(b, 8) != log2) return None // entrySelector
    if (be16(b, 10) != 16 * n - 16 * (1 << log2)) return None // rangeShift
    if (12 + 16 * n > b.length) return None
    var lastTag = ""
    var headAt = -1; var headLen = -1
    var maxpAt = -1; var maxpLen = -1
    var i = 0
    while (i < n) {
      val rec = 12 + 16 * i
      val tag = new String(b, rec, 4, "US-ASCII")
      if (tag <= lastTag) return None // directory must be tag-sorted
      lastTag = tag
      val ck = be32(b, rec + 4)
      val off = be32(b, rec + 8)
      val len = be32(b, rec + 12)
      if (off < 12 + 16 * n || len < 0 ||
          off + ((len + 3) & ~3L) > b.length) return None
      val zeroAt = if (tag == "head") 8 else -1
      if (checksum(b, off.toInt, len.toInt, zeroAt) != ck) return None
      if (tag == "head") { headAt = off.toInt; headLen = len.toInt }
      if (tag == "maxp") { maxpAt = off.toInt; maxpLen = len.toInt }
      i += 1
    }
    if (headAt < 0 || headLen < 54 || maxpAt < 0 || maxpLen < 6) return None
    if (be32(b, headAt) != 0x00010000L) return None
    if (be32(b, headAt + 12) != 0x5F0F3CF5L) return None // magicNumber
    val upem = be16(b, headAt + 18)
    if (upem < 16 || upem > 16384) return None // spec range
    val xMin = s16(b, headAt + 36); val yMin = s16(b, headAt + 38)
    val xMax = s16(b, headAt + 40); val yMax = s16(b, headAt + 42)
    if (be32(b, maxpAt) != 0x00010000L) return None
    val nGlyphs = be16(b, maxpAt + 4)
    Some(TtfFeatures(id, n, upem, nGlyphs, xMin, yMin, xMax, yMax))
  }
}
