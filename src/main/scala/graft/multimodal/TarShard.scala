package graft.multimodal

import org.apache.spark.sql.Dataset

/** TAR (POSIX ustar) shard LISTING lane — the WebDataset shape: large
  * multimodal corpora ship as .tar shards whose members pair by basename
  * (`000017.jpg` + `000017.txt` + `000017.json`), and the first pipeline
  * pass lists members and pairs them WITHOUT extracting anything. Real
  * format details, all verified:
  *
  *  - 512-byte header blocks; name (100 B, NUL-padded), size (12 B OCTAL
  *    — the classic surprise), typeflag, magic "ustar";
  *  - the header CHECKSUM: sum of all header bytes with the checksum
  *    field itself read as eight SPACES — computed and REQUIRED to match
  *    (a corrupted shard fails loudly, per-member);
  *  - member data padded to the next 512-byte boundary; two zero blocks
  *    terminate the archive;
  *  - bomb guard: a declared member size past the archive drops the row.
  *
  * Features are WebDataset-aware: members, total payload bytes, distinct
  * basenames (= samples), and whether every sample carries the full
  * extension set — the pairing integrity check a sharded corpus needs
  * before training reads it. */
object TarShard {

  case class TarFile(id: Long, media: Array[Byte])
  case class TarFeatures(id: Long, n_members: Long, total_bytes: Long,
                         n_samples: Long, all_paired: Boolean)

  private val Block = 512
  /** Bomb guard: max members a shard may claim. */
  private val MaxMembers = 100000

  // ---- encode ------------------------------------------------------------

  private[graft] def headerFor(name: String, size: Int): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nb = name.getBytes("ISO-8859-1")
    System.arraycopy(nb, 0, h, 0, nb.length)
    // mode/uid/gid: octal ASCII, NUL-terminated
    "0000644".getBytes.copyToArray(h, 100)
    "0000000".getBytes.copyToArray(h, 108)
    "0000000".getBytes.copyToArray(h, 116)
    f"$size%011o".getBytes.copyToArray(h, 124) // size, octal
    "00000000000".getBytes.copyToArray(h, 136) // mtime
    h(156) = '0' // typeflag: regular file
    "ustar".getBytes.copyToArray(h, 257)
    h(263) = '0'; h(264) = '0' // version "00"
    // checksum: field counts as 8 spaces while summing
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0
    h.foreach(b => sum += (b & 0xff))
    f"$sum%06o".getBytes.copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h
  }

  /** Deterministic WebDataset-style shard: (2 + id%4) samples, each with
    * a .jpg and a .txt member (and a .json for every second sample —
    * so `all_paired` over {jpg, txt} stays TRUE while the extension mix
    * is realistic); payload bytes from the id formula; two zero blocks
    * close the archive. */
  def syntheticTar(ids: Dataset[Long]): Dataset[TarFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => TarFile(id, encodeOne(id)))
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val nSamples = (2 + id % 4).toInt
    val out = new java.io.ByteArrayOutputStream()
    def member(name: String, size: Int): Unit = {
      out.write(headerFor(name, size))
      val data = Array.tabulate[Byte](size)(i => ((id + i) % 251).toByte)
      out.write(data)
      val pad = (Block - size % Block) % Block
      out.write(new Array[Byte](pad))
    }
    (0 until nSamples).foreach { s =>
      val base = f"${id}%05d_$s%03d"
      member(s"$base.jpg", 100 + ((id + s) % 50).toInt)
      member(s"$base.txt", 10 + (s % 7))
      if (s % 2 == 0) member(s"$base.json", 20 + (s % 3))
    }
    out.write(new Array[Byte](2 * Block)) // terminator
    out.toByteArray
  }

  /** Router predicate: "ustar" magic at offset 257 of the first block. */
  private[multimodal] def looksLikeTar(b: Array[Byte]): Boolean =
    b.length >= Block && b(257) == 'u' && b(258) == 's' && b(259) == 't' &&
      b(260) == 'a' && b(261) == 'r'

  def listTar(media: Dataset[TarFile]): Dataset[TarFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private def parseOctal(b: Array[Byte], at: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = at
    var seen = false
    while (i < at + len) {
      val c = b(i) & 0xff
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == 0 || c == ' ') { /* pad */ }
      else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  /** Per-row entry point (shared with the magic-byte router). */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[TarFeatures] = {
    if (!looksLikeTar(b)) return None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var total = 0L
    var off = 0
    var done = false
    while (!done) {
      if (off + Block > b.length) return None // truncated mid-header
      if (b.slice(off, off + Block).forall(_ == 0)) done = true // terminator
      else {
        if (names.length >= MaxMembers) return None // bomb guard
        // checksum: header bytes with the checksum field as spaces
        var sum = 0L
        var i = 0
        while (i < Block) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else (b(off + i) & 0xff))
          i += 1
        }
        val claimed = parseOctal(b, off + 148, 8).getOrElse(return None)
        if (claimed != sum) return None // corrupted header
        val size = parseOctal(b, off + 124, 12).getOrElse(return None)
        if (size < 0 || size > Int.MaxValue) return None
        val nameEnd = (off until off + 100).find(b(_) == 0).getOrElse(off + 100)
        val name = new String(b, off, nameEnd - off, "ISO-8859-1")
        if (name.isEmpty) return None
        val dataBlocks = ((size + Block - 1) / Block).toInt
        if (off + Block + dataBlocks * Block > b.length) return None // forged size
        if ((b(off + 156) & 0xff) == '0') { // regular files only
          names += name
          total += size
        }
        off += Block + dataBlocks * Block
      }
    }
    val samples = names.map(n => n.substring(0, n.lastIndexOf('.') max 0))
      .filter(_.nonEmpty).distinct
    val byBase = names.groupBy(n => n.substring(0, n.lastIndexOf('.') max 0))
    val paired = samples.nonEmpty && samples.forall { s =>
      val exts = byBase.getOrElse(s, Seq.empty).map(n => n.substring(n.lastIndexOf('.') + 1)).toSet
      exts.contains("jpg") && exts.contains("txt")
    }
    Some(TarFeatures(id, names.length.toLong, total, samples.length.toLong, paired))
  }
}
