package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL MPEG-1 Layer III (MP3) frame-header walk — the audio METADATA
  * lane next to [[H264Meta]]/[[Mp4Meta]]: no entropy decode (the
  * documented codec-ladder ceiling), but everything a corpus audit needs
  * from an MP3 is parsed from real bytes and verified:
  *
  *  - ID3v2 prefix skip with the SYNCSAFE 28-bit size (7 bits per byte —
  *    the classic off-by-(size>>7) when read as a plain BE32);
  *  - per-frame 4-byte header parse: sync, version/layer gate
  *    (MPEG-1 Layer III only), bitrate INDEX through the standard kbps
  *    table (indexes 0 'free' and 15 are invalid → stop), sample-rate
  *    index, padding bit;
  *  - the frame STRIDE is computed, not scanned: 144·bitrate/samplerate
  *    + padding (integer division — ISO 11172-3 §2.4.3.1), so payload
  *    bytes that happen to contain 0xFF sync patterns can't fork the
  *    walk; a final frame whose computed stride overruns the buffer is
  *    truncated and NOT counted;
  *  - VBR detection = more than one distinct frame bitrate (what Xing/
  *    VBRI headers summarize; here measured from the frames themselves);
  *  - duration is exact integer µs: frames · 1152 samples · 10⁶ DIV rate.
  *
  * Row-local `mapPartitions`; bytes never leave the executor.
  */
object Mp3Meta {

  case class Mp3File(id: Long, media: Array[Byte])
  case class Mp3Info(id: Long, has_id3: Boolean, id3_size: Long,
                     n_frames: Long, samplerate: Long, sum_kbps: Long,
                     vbr: Boolean, duration_us: Long)

  /** MPEG-1 Layer III bitrate table, kbps by header index (1–14). */
  private val Kbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val Rates = Array(44100, 48000, 32000, 0)

  private val MaxFrames = 1 << 20

  /** Fixture formulas (shared with the oracle): n = 3 + id % 6 frames,
    * samplerate index id % 3, CBR (index 1 + id % 14) when id % 4 == 0
    * else VBR (index 1 + (id+j) % 14 per frame j), padding bit (id+j) % 2,
    * ID3v2 prefix of syncsafe size 20 + id % 50 on even ids. */
  def syntheticMp3(ids: Dataset[Long]): Dataset[Mp3File] = {
    import ids.sparkSession.implicits._
    ids.map { id => Mp3File(id, encodeOne(id)) }
  }

  def encodeOne(id: Long): Array[Byte] = {
    val n = (3 + id % 6).toInt
    val srIdx = (id % 3).toInt
    val sr = Rates(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    if (id % 2 == 0) {
      val tagSize = (20 + id % 50).toInt // < 128: fits one syncsafe byte
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0) // v2.3.0
      out.write(0) // flags
      out.write(0); out.write(0); out.write(0); out.write(tagSize) // syncsafe
      (0 until tagSize).foreach(k => out.write(((id + k) % 251).toInt))
    }
    (0 until n).foreach { j =>
      val bi = if (id % 4 == 0) (1 + id % 14).toInt else (1 + (id + j) % 14).toInt
      val pad = ((id + j) % 2).toInt
      val frameLen = 144 * Kbps(bi) * 1000 / sr + pad
      out.write(0xff)
      out.write(0xfb) // MPEG-1 (11), Layer III (01), no CRC (1)
      out.write((bi << 4) | (srIdx << 2) | (pad << 1))
      out.write(0xc0) // mono, no ext, no copyright/original, no emphasis
      // deterministic payload, % 251 so no byte is 0xFF (sanity: the walk
      // is stride-based anyway; this keeps any sync-scan cross-check honest)
      (4 until frameLen).foreach(k => out.write(((id * 7 + j + k) % 251).toInt))
    }
    out.toByteArray
  }

  private[multimodal] def looksLikeMp3(b: Array[Byte]): Boolean =
    (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)

  def decodeMp3(media: Dataset[Mp3File]): Dataset[Mp3Info] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Per-file walk. Malformed prefix/every-frame-invalid → None. */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[Mp3Info] = {
    var i = 0
    var hasId3 = false
    var id3Size = 0L
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit size: 7 data bits per byte, top bit must be 0
      if (((b(6) | b(7) | b(8) | b(9)) & 0x80) != 0) return None
      id3Size = ((b(6) & 0x7fL) << 21) | ((b(7) & 0x7fL) << 14) |
        ((b(8) & 0x7fL) << 7) | (b(9) & 0x7fL)
      if (10 + id3Size > b.length) return None // forged tag size
      hasId3 = true
      i = (10 + id3Size).toInt
    }
    var frames = 0L
    var samplerate = 0L
    var sumKbps = 0L
    var firstKbps = -1
    var vbr = false
    var stop = false
    while (!stop && i + 4 <= b.length && frames < MaxFrames) {
      if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) stop = true
      else {
        val version = (b(i + 1) >> 3) & 0x3
        val layer = (b(i + 1) >> 1) & 0x3
        if (version != 3 || layer != 1) stop = true // MPEG-1 Layer III only
        else {
          val bi = (b(i + 2) >> 4) & 0xf
          val srIdx = (b(i + 2) >> 2) & 0x3
          val pad = (b(i + 2) >> 1) & 0x1
          if (bi == 0 || bi == 15 || srIdx == 3) stop = true // free/bad
          else {
            val sr = Rates(srIdx)
            val len = 144 * Kbps(bi) * 1000 / sr + pad
            if (i + len > b.length) stop = true // truncated final frame
            else if (samplerate != 0L && samplerate != sr)
              stop = true // mixed-rate frame: stop WITHOUT counting it
            else {
              samplerate = sr
              if (firstKbps < 0) firstKbps = Kbps(bi)
              else if (Kbps(bi) != firstKbps) vbr = true
              sumKbps += Kbps(bi)
              frames += 1
              i += len
            }
          }
        }
      }
    }
    if (frames == 0) None
    else Some(Mp3Info(id, hasId3, id3Size, frames, samplerate, sumKbps, vbr,
      frames * 1152L * 1000000L / samplerate))
  }
}
