package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM OGG container metadata codec — the page-structured
  * stream container (Vorbis/Opus/Theora transport). Every page-level
  * mechanism a real demuxer needs is implemented and verified:
  *
  *  - the 27-byte page header (`OggS`, version 0, header-type flags,
  *    64-bit granule position, serial, page sequence, CRC, segment
  *    count);
  *  - SEGMENT LACING: packet sizes are encoded as runs of 255-valued
  *    lacing bytes terminated by a byte < 255 — a 300-byte packet laces
  *    as [255, 45], and a packet of EXACTLY 255·k bytes needs a trailing
  *    0 lacing byte (the classic encoder bug; the fixture emits both
  *    shapes);
  *  - the OGG CRC-32: polynomial 0x04c11db7, MSB-first, init 0, NO final
  *    xor, computed with the CRC field zeroed — this is NOT the zlib CRC
  *    (reflected, init/xor 0xffffffff); swapping them is the classic
  *    cross-codec mistake. Every page's CRC is verified;
  *  - page sequence numbers must increment from 0 (a spliced stream
  *    drops).
  *
  * Truncation, CRC mismatch, version/magic forgeries drop
  * (coerce-to-null). Decode is row-local `mapPartitions`.
  */
object Ogg {

  case class OggFile(id: Long, media: Array[Byte])
  case class OggMeta(id: Long, serial: Long, n_pages: Int, n_packets: Long,
                     granule_last: Long)

  private val MaxPages = 4096

  /** Fixture formulas shared with the oracle: serial = 1000 + id % 97,
    * n_pages = 1 + id % 3, page p carries 1 + (id+p) % 3 packets, packet
    * q of page p is 300 bytes when (id+p+q) ≡ 0 (mod 4) (laces 255+45),
    * 510 bytes when ≡ 1 (laces 255,255,0 — the exact-multiple case),
    * else 20 + (id+q) % 50; granule of the last page =
    * (id+1)·1000·n_pages. */
  def shape(id: Long): (Long, Int, Long, Long) = {
    val nPages = (1 + id % 3).toInt
    val nPackets = (0 until nPages).map(p => 1 + (id + p) % 3).sum
    (1000 + id % 97, nPages, nPackets, (id + 1) * 1000 * nPages)
  }

  private[multimodal] def packetSize(id: Long, p: Int, q: Int): Int =
    if ((id + p + q) % 4 == 0) 300
    else if ((id + p + q) % 4 == 1) 510
    else (20 + (id + q) % 50).toInt

  /** The OGG CRC: 0x04c11db7 MSB-first, init 0, no reflection, no final
    * xor. Table-driven, one table per JVM. */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  def oggCrc(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xff)) & 0xff)
      i += 1
    }
    crc
  }

  private def putLE32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def putLE64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    putLE32(o, (v & 0xffffffffL).toInt); putLE32(o, (v >>> 32).toInt)
  }
  private def le32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
  private def le64(b: Array[Byte], at: Int): Long =
    (le32(b, at) & 0xffffffffL) | ((le32(b, at + 4) & 0xffffffffL) << 32)

  def syntheticOgg(ids: Dataset[Long]): Dataset[OggFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => OggFile(id, encodeOne(id)))
  }

  private def lacing(size: Int): Seq[Int] = {
    val full = size / 255
    Seq.fill(full)(255) :+ (size % 255) // exact multiples get the 0 tail
  }

  def encodeOne(id: Long): Array[Byte] = {
    val (serial, nPages, _, _) = shape(id)
    val out = new java.io.ByteArrayOutputStream()
    (0 until nPages).foreach { p =>
      val sizes = (0 until (1 + (id + p) % 3).toInt)
        .map(q => packetSize(id, p, q))
      val lace = sizes.flatMap(lacing)
      val page = new java.io.ByteArrayOutputStream()
      page.write('O'); page.write('g'); page.write('g'); page.write('S')
      page.write(0) // version
      page.write(if (p == 0) 0x02 else if (p == nPages - 1) 0x04 else 0x00)
      putLE64(page, (id + 1) * 1000 * (p + 1))
      putLE32(page, serial.toInt)
      putLE32(page, p) // page sequence
      putLE32(page, 0) // CRC placeholder
      page.write(lace.length)
      lace.foreach(page.write)
      sizes.zipWithIndex.foreach { case (sz, q) =>
        var i = 0
        while (i < sz) { page.write(((id + p + q + i * 7) % 256).toInt); i += 1 }
      }
      val bytes = page.toByteArray
      val crc = oggCrc(bytes, 0, bytes.length)
      bytes(22) = (crc & 0xff).toByte
      bytes(23) = ((crc >>> 8) & 0xff).toByte
      bytes(24) = ((crc >>> 16) & 0xff).toByte
      bytes(25) = ((crc >>> 24) & 0xff).toByte
      out.write(bytes)
    }
    out.toByteArray
  }

  private[multimodal] def looksLikeOgg(b: Array[Byte]): Boolean =
    b.length >= 27 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
      b(3) == 'S' && b(4) == 0

  def decodeOgg(media: Dataset[OggFile]): Dataset[OggMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[OggMeta] = {
    if (!looksLikeOgg(b)) return None
    var at = 0
    var pageNo = 0
    var serial = -1L
    var granule = 0L
    var packets = 0L
    while (at < b.length) {
      if (pageNo > MaxPages) return None
      if (at + 27 > b.length) return None
      if (b(at) != 'O' || b(at + 1) != 'g' || b(at + 2) != 'g' ||
          b(at + 3) != 'S' || b(at + 4) != 0) return None
      granule = le64(b, at + 6)
      val ser = le32(b, at + 14) & 0xffffffffL
      if (serial < 0) serial = ser else if (ser != serial) return None
      if (le32(b, at + 18) != pageNo) return None // sequence must increment
      val claimedCrc = le32(b, at + 22)
      val nSegs = b(at + 26) & 0xff
      if (at + 27 + nSegs > b.length) return None
      var body = 0
      var q = 0
      while (q < nSegs) {
        val l = b(at + 27 + q) & 0xff
        body += l
        if (l < 255) packets += 1
        q += 1
      }
      val end = at + 27 + nSegs + body
      if (end > b.length) return None
      // CRC over the page with the CRC field zeroed: fold the prefix, four
      // zero bytes, then the rest — no copy
      var crc = oggCrc(b, at, at + 22)
      var z = 0
      while (z < 4) { crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ 0) & 0xff); z += 1 }
      crc = {
        var c = crc
        var i = at + 26
        while (i < end) { c = (c << 8) ^ crcTable(((c >>> 24) ^ (b(i) & 0xff)) & 0xff); i += 1 }
        c
      }
      if (crc != claimedCrc) return None
      at = end
      pageNo += 1
    }
    if (pageNo == 0) None
    else Some(OggMeta(id, serial, pageNo, packets, granule))
  }
}
