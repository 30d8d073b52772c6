package graft.multimodal

import org.apache.spark.sql.Dataset

/** ZIP shard lane — the other container large multimodal corpora ship in
  * (TFDS/ImageNet-style `.zip` shards next to WebDataset `.tar`s). REAL
  * format walk, all the classic traps implemented and verified:
  *
  *  - the End-Of-Central-Directory record (PK\x05\x06) is found by
  *    scanning BACKWARD from the file end past a variable-length comment
  *    (up to 65535 B) — the part naive readers skip, and the reason a ZIP
  *    cannot be streamed front-to-back safely;
  *  - the CENTRAL DIRECTORY is the source of truth (count, sizes, name,
  *    per-member local-header offsets); each member's LOCAL header
  *    signature (PK\x03\x04) is verified at its claimed offset;
  *  - members decompress for REAL: method 8 = raw deflate via
  *    `java.util.zip.Inflater(nowrap = true)` (the wrapped/zlib variant is
  *    the other classic bug), method 0 = stored;
  *  - CRC-32 of the INFLATED bytes must match the directory's CRC, and the
  *    inflated length must match the declared uncompressed size — a
  *    corrupted or forged member drops the whole shard row (decode
  *    validates claimed metadata, never trusts it);
  *  - bomb guards: member-count cap and declared-uncompressed-size cap
  *    BEFORE any allocation (the 42.zip shape dies at the header).
  *
  * Listing is row-local `mapPartitions` — bytes never leave the executor,
  * the 100 TB posture shared by every codec lane. */
object Zip {

  case class ZipFile(id: Long, media: Array[Byte])
  case class ZipFeatures(id: Long, n_members: Long, total_bytes: Long,
                         n_deflated: Long, n_stored: Long)

  /** Bomb guards. */
  private val MaxMembers = 65535
  private val MaxMemberBytes = 64 * 1024 * 1024

  // ---- encode ------------------------------------------------------------

  private def u16(v: Int): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Long): Array[Byte] =
    Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Deterministic shard: 2 + id%3 members; member payload from the id
    * formula; even members deflate, odd members store; an id-dependent
    * EOCD comment (0..19 B) forces the backward scan to do real work. */
  def syntheticZip(ids: Dataset[Long]): Dataset[ZipFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => ZipFile(id, encodeOne(id)))
  }

  private[graft] def memberPayload(id: Long, s: Int): Array[Byte] = {
    val n = 50 + ((id + s) % 40).toInt
    // low-entropy bytes so deflate genuinely compresses (mod-7 repeats)
    Array.tabulate[Byte](n)(i => (((id + s) % 7) + 'a' + (i % 3)).toByte)
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val n = (2 + id % 3).toInt
    val out = new java.io.ByteArrayOutputStream()
    case class Cd(name: Array[Byte], method: Int, crc: Long, csize: Int,
                  usize: Int, offset: Int)
    val cds = (0 until n).map { s =>
      val name = s"m${id}_$s.txt".getBytes("US-ASCII")
      val data = memberPayload(id, s)
      val crc = { val c = new java.util.zip.CRC32(); c.update(data); c.getValue }
      val (method, payload) =
        if (s % 2 == 0) (8, deflateRaw(data)) else (0, data)
      val offset = out.size()
      out.write(Array[Byte]('P', 'K', 3, 4))
      out.write(u16(20)); out.write(u16(0)) // version needed, flags
      out.write(u16(method))
      out.write(u16(0)); out.write(u16(0)) // mod time/date
      out.write(u32(crc)); out.write(u32(payload.length)); out.write(u32(data.length))
      out.write(u16(name.length)); out.write(u16(0)) // name len, extra len
      out.write(name)
      out.write(payload)
      Cd(name, method, crc, payload.length, data.length, offset)
    }
    val cdStart = out.size()
    cds.foreach { c =>
      out.write(Array[Byte]('P', 'K', 1, 2))
      out.write(u16(20)); out.write(u16(20)); out.write(u16(0)) // made by, needed, flags
      out.write(u16(c.method))
      out.write(u16(0)); out.write(u16(0)) // time/date
      out.write(u32(c.crc)); out.write(u32(c.csize)); out.write(u32(c.usize))
      out.write(u16(c.name.length)); out.write(u16(0)); out.write(u16(0)) // name/extra/comment len
      out.write(u16(0)); out.write(u16(0)); out.write(u32(0)) // disk, int attrs, ext attrs
      out.write(u32(c.offset))
      out.write(c.name)
    }
    val cdSize = out.size() - cdStart
    val comment = Array.tabulate[Byte]((id % 20).toInt)(i => ('!' + i % 30).toByte)
    out.write(Array[Byte]('P', 'K', 5, 6))
    out.write(u16(0)); out.write(u16(0)) // disk numbers
    out.write(u16(n)); out.write(u16(n)) // entries this disk / total
    out.write(u32(cdSize)); out.write(u32(cdStart))
    out.write(u16(comment.length)); out.write(comment)
    out.toByteArray
  }

  /** Router predicate: local-header magic at byte 0. */
  private[multimodal] def looksLikeZip(b: Array[Byte]): Boolean =
    b.length >= 22 && b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4

  // ---- decode ------------------------------------------------------------

  def listZip(media: Dataset[ZipFile]): Dataset[ZipFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private def rd16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  private def inflateRaw(payload: Array[Byte], expectedLen: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: RAW deflate, no zlib header
    inf.setInput(payload)
    val out = new Array[Byte](expectedLen)
    try {
      var got = 0
      while (got < expectedLen && !inf.finished()) {
        val k = inf.inflate(out, got, expectedLen - got)
        if (k == 0 && inf.needsInput()) return None // truncated stream
        got += k
      }
      // stream must END here: extra trailing inflated bytes = a size lie
      val probe = new Array[Byte](1)
      if (got != expectedLen || (!inf.finished() && inf.inflate(probe) > 0)) None
      else Some(out)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Per-row entry point (shared with the magic-byte router). */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[ZipFeatures] = {
    if (!looksLikeZip(b)) return None
    // EOCD: scan BACKWARD past the (≤65535 B) comment for PK\x05\x06 whose
    // declared comment length lands exactly on the file end
    var eocd = -1
    var p = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && p >= stop) {
      if (b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 5 && b(p + 3) == 6 &&
        p + 22 + rd16(b, p + 20) == b.length) eocd = p
      p -= 1
    }
    if (eocd < 0) return None
    val nEntries = rd16(b, eocd + 10)
    if (nEntries > MaxMembers) return None
    val cdSize = rd32(b, eocd + 12)
    val cdStart = rd32(b, eocd + 16)
    if (cdStart + cdSize > eocd) return None // directory overruns its record
    var off = cdStart.toInt
    var total = 0L
    var nDeflated = 0L
    var nStored = 0L
    var i = 0
    while (i < nEntries) {
      if (off + 46 > eocd) return None // truncated directory
      if (!(b(off) == 'P' && b(off + 1) == 'K' && b(off + 2) == 1 && b(off + 3) == 2))
        return None
      val method = rd16(b, off + 10)
      val crc = rd32(b, off + 16)
      val csize = rd32(b, off + 20)
      val usize = rd32(b, off + 24)
      val nameLen = rd16(b, off + 28)
      val extraLen = rd16(b, off + 30)
      val commentLen = rd16(b, off + 32)
      val lho = rd32(b, off + 42)
      if (usize > MaxMemberBytes || csize > MaxMemberBytes) return None // bomb
      // local header at the claimed offset: signature + its own name/extra
      if (lho + 30 > b.length) return None
      val l = lho.toInt
      if (!(b(l) == 'P' && b(l + 1) == 'K' && b(l + 2) == 3 && b(l + 3) == 4))
        return None
      val lNameLen = rd16(b, l + 26)
      val lExtraLen = rd16(b, l + 28)
      val dataAt = l + 30 + lNameLen + lExtraLen
      if (dataAt + csize > b.length) return None // forged size past the file
      val payload = java.util.Arrays.copyOfRange(b, dataAt, dataAt + csize.toInt)
      val inflated = method match {
        case 0 => if (csize == usize) Some(payload) else None
        case 8 => inflateRaw(payload, usize.toInt)
        case _ => None // unsupported method = unreadable shard
      }
      val data = inflated.getOrElse(return None)
      val c = new java.util.zip.CRC32(); c.update(data)
      if (c.getValue != crc) return None // corrupted member
      total += usize
      if (method == 8) nDeflated += 1 else nStored += 1
      off += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    Some(ZipFeatures(id, nEntries.toLong, total, nDeflated, nStored))
  }
}
