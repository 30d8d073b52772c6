package graft.multimodal

import org.apache.spark.sql.Dataset

/** MP4 / ISO-BMFF METADATA lane (ISO/IEC 14496-12 box structure) — the
  * CONTAINER around the [[H264Meta]] elementary stream, which completes
  * the video-metadata story: corpus clips arrive as .mp4 files, and the
  * first pipeline pass walks boxes, not samples. Real structure, real
  * traps, no sample decode (the documented ladder ceiling):
  *
  *  - length-prefixed box walk: every box is (size u32, type 4cc); size
  *    INCLUDES the 8-byte header; `size == 1` escapes to a 64-bit
  *    largesize (emitted for one fixture stride, parsed for all);
  *  - container boxes (`moov`, `trak`, `mdia`) nest — the walker recurses
  *    by byte range, never by trusting sibling counts;
  *  - `mvhd` (movie header): version 0 vs 1 changes field WIDTHS
  *    (u32 vs u64 times) — both versions emitted and parsed; duration =
  *    duration_ticks / timescale, reported in exact milliseconds;
  *  - `tkhd` (track header): width/height are 16.16 FIXED-POINT — the
  *    classic mistake is reading them as integers (off by 65536×);
  *  - forged boxes drop the row: size smaller than the header, size past
  *    the payload, a largesize bomb, a stream without `moov`/`mvhd`.
  *
  * Decode is row-local `mapPartitions` like every codec lane. */
object Mp4Meta {

  case class Mp4Clip(id: Long, media: Array[Byte])
  case class Mp4Features(id: Long, n_tracks: Int, width: Int, height: Int,
                         timescale: Long, duration_ms: Long, n_boxes: Long)

  /** Bomb guard: max boxes walked per clip. */
  private val MaxBoxes = 10000

  private def be32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
  private def be64(b: Array[Byte], at: Int): Long =
    (be32(b, at) << 32) | be32(b, at + 4)
  private def put32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >>> 24) & 0xff).toInt); o.write(((v >>> 16) & 0xff).toInt)
    o.write(((v >>> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }

  private def box(typ: String, payload: Array[Byte],
                  large: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    if (large) {
      put32(o, 1) // size escape
      typ.foreach(c => o.write(c.toInt))
      val total = 16L + payload.length
      put32(o, total >>> 32); put32(o, total & 0xffffffffL)
    } else {
      put32(o, 8L + payload.length)
      typ.foreach(c => o.write(c.toInt))
    }
    o.write(payload)
    o.toByteArray
  }

  /** Deterministic MP4 fixture: ftyp + moov(mvhd + n_tracks × trak(tkhd))
    * + mdat. Dims (16·(1+id%4)) × (16·(1+id%3)) ride tkhd's 16.16
    * fixed-point fields; timescale 1000·(1+id%3), duration ticks
    * 500·(1+id%7); mvhd is VERSION 1 (64-bit times) for id%2==0, version
    * 0 otherwise; the mdat box uses the 64-bit largesize escape for
    * id%3==0. */
  def syntheticMp4(ids: Dataset[Long]): Dataset[Mp4Clip] = {
    import ids.sparkSession.implicits._
    ids.map(id => Mp4Clip(id, encodeOne(id)))
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val w = 16 * (1 + id % 4).toInt
    val h = 16 * (1 + id % 3).toInt
    val timescale = 1000L * (1 + id % 3)
    val ticks = 500L * (1 + id % 7)
    val nTracks = (1 + id % 2).toInt
    val v1 = id % 2 == 0

    val mvhd = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(if (v1) 1 else 0); o.write(0); o.write(0); o.write(0) // version+flags
      if (v1) { // 64-bit creation/modification times, 32-bit timescale, 64-bit duration
        put32(o, 0); put32(o, 0); put32(o, 0); put32(o, 0)
        put32(o, timescale)
        put32(o, ticks >>> 32); put32(o, ticks & 0xffffffffL)
      } else {
        put32(o, 0); put32(o, 0)
        put32(o, timescale)
        put32(o, ticks)
      }
      box("mvhd", o.toByteArray)
    }
    def tkhd(trackId: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(0); o.write(0); o.write(0); o.write(3) // version 0, flags: enabled
      put32(o, 0); put32(o, 0) // times
      put32(o, trackId.toLong)
      put32(o, 0); put32(o, 0) // reserved, duration
      (0 until 13).foreach(_ => put32(o, 0)) // reserved/layer/volume/matrix-ish pad
      put32(o, w.toLong << 16) // 16.16 fixed-point width
      put32(o, h.toLong << 16) // 16.16 fixed-point height
      box("trak", box("tkhd", o.toByteArray))
    }
    val moov = box("moov",
      mvhd ++ (1 to nTracks).flatMap(tkhd).toArray)
    val ftyp = box("ftyp", "isomiso2".getBytes("ISO-8859-1"))
    val mdat = box("mdat",
      Array.tabulate[Byte](8)(i => ((id + i) % 251).toByte),
      large = id % 3 == 0)
    ftyp ++ moov ++ mdat
  }

  /** Router predicate: the ftyp box at offset 0 (type at bytes 4-7). */
  private[multimodal] def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  def decodeMp4(media: Dataset[Mp4Clip]): Dataset[Mp4Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Walk the boxes in [from, to); returns (type, payloadFrom, payloadTo)
    * or None on any malformed size. */
  private def walk(b: Array[Byte], from: Int, to: Int,
                   count: Array[Int]): Option[Seq[(String, Int, Int)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = from
    while (i < to) {
      if (i + 8 > to) return None
      count(0) += 1
      if (count(0) > MaxBoxes) return None // bomb guard
      val size32 = be32(b, i)
      val typ = new String(b, i + 4, 4, "ISO-8859-1")
      var header = 8
      val size: Long =
        if (size32 == 1L) {
          if (i + 16 > to) return None
          header = 16
          be64(b, i + 8)
        } else size32
      if (size < header || i + size > to) return None // forged size
      out += ((typ, i + header, i + size.toInt))
      i += size.toInt
    }
    Some(out.toSeq)
  }

  /** Per-row entry point (shared with the magic-byte router). */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[Mp4Features] = {
    if (!looksLikeMp4(b)) return None
    val count = Array(0)
    for {
      top <- walk(b, 0, b.length, count)
      moov <- top.find(_._1 == "moov")
      inMoov <- walk(b, moov._2, moov._3, count)
      mvhd <- inMoov.find(_._1 == "mvhd")
      meta <- parseMvhd(b, mvhd._2, mvhd._3)
      traks = inMoov.filter(_._1 == "trak")
      dims <- firstTrackDims(b, traks, count)
    } yield {
      val (timescale, durMs) = meta
      // boxes WALKED: top-level + moov children + the first trak's children
      // — a pure function of the structure, so the oracle replays it
      Mp4Features(id, traks.size, dims._1, dims._2, timescale, durMs,
        count(0).toLong)
    }
  }

  private def parseMvhd(b: Array[Byte], from: Int, to: Int): Option[(Long, Long)] = {
    if (to - from < 4) return None
    val version = b(from) & 0xff
    if (version == 1) {
      if (to - from < 4 + 16 + 4 + 8) return None
      val timescale = be32(b, from + 20)
      val ticks = be64(b, from + 24)
      if (timescale <= 0) return None
      Some((timescale, ticks * 1000L / timescale))
    } else if (version == 0) {
      if (to - from < 4 + 8 + 4 + 4) return None
      val timescale = be32(b, from + 12)
      val ticks = be32(b, from + 16)
      if (timescale <= 0) return None
      Some((timescale, ticks * 1000L / timescale))
    } else None
  }

  private def firstTrackDims(b: Array[Byte], traks: Seq[(String, Int, Int)],
                             count: Array[Int]): Option[(Int, Int)] =
    traks.headOption.flatMap { case (_, from, to) =>
      walk(b, from, to, count).flatMap(_.find(_._1 == "tkhd")).flatMap {
        case (_, tf, tt) =>
          // version(1)+flags(3) + times(8) + id(4) + reserved+duration(8)
          // + 13 u32 pad, then 16.16 width/height
          val at = tf + 4 + 8 + 4 + 8 + 13 * 4
          if (at + 8 > tt) None
          else {
            val w = (be32(b, at) >>> 16).toInt  // 16.16 → integer part
            val h = (be32(b, at + 4) >>> 16).toInt
            if (w <= 0 || h <= 0 || w > 65535 || h > 65535) None
            else Some((w, h))
          }
      }
    }
}
