package graft.multimodal

import org.apache.spark.sql.Dataset

/** MJPEG-in-AVI video lane — the REAL codec composition that closes the
  * video stand-in: the RIFF chunk walk (the [[Multimodal.decodeWav]]
  * container idiom, extended to nested LISTs) finds the per-frame JPEG
  * payloads, and each frame decodes through the project's baseline JPEG
  * decoder ([[Jpeg.decodeOne]] — Huffman + dequant + IDCT + upsample).
  * One decoder, two containers: a JPEG hardening fix automatically hardens
  * the video lane.
  *
  * Container scope (mirrors the reference's decode-to-features contract,
  * e.g. video_utils in the reference repo — features, not playback):
  * single 'vids' stream, '00dc'/'00db' frame chunks inside the 'movi'
  * LIST, 'avih' declaring dims + frame count. idx1 is ignored (it is an
  * optimization index, not data). Anything malformed — wrong magic, forged
  * chunk sizes, frame-count or dimension mismatches, an undecodable frame
  * — drops the whole row (coerce-to-null rule): a video with one bad frame
  * is corrupt evidence, not partial data.
  *
  * Scale posture: `mapPartitions` over binary rows, constant memory per
  * row beyond the decoded frame (the JPEG decoder's byte-proportional
  * budgets bound each frame's transient allocation; `MaxFrames` bounds the
  * per-row output). Videos are opaque bytes in a `binary` column — the
  * schema/partitioning plumbing is identical to the image/audio lanes.
  */
object Video {

  case class VideoRow(id: Long, media: Array[Byte])

  /** One decoded frame's features; `n_frames` rides along so per-video
    * assertions need no second aggregation pass. */
  case class VideoFrame(id: Long, frame: Int, n_frames: Int,
                        width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  /** Declared-frame-count sanity cap: a forged avih can claim 2^32 frames;
    * real corpus clips at features-extraction granularity are far shorter,
    * and the movi walk below never materializes more than this many frame
    * references. */
  private val MaxFrames = 4096

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  // ------------------------------------------------------------- fixture

  /** Deterministic MJPEG-AVI fixture: the JPEG generation-formula family
    * with a per-frame time shift, so an oracle replays expected features
    * while the Spark path round-trips encode → container walk → Huffman
    * decode. Frame `t`, pixel (x, y) of video `id`:
    * (R, G, B) = ((id + 3x + 7y + 11t) % 256, (2·id + x + 5t) % 256,
    * (id + y + 2t) % 256); dims (5 + id%9, 4 + id%9); 2 + id%4 frames. */
  def syntheticAvi(ids: Dataset[Long]): Dataset[VideoRow] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (5 + id % 9).toInt
      val h = (4 + id % 9).toInt
      val n = (2 + id % 4).toInt
      val frames = (0 until n).map { t =>
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            rgb(p) = ((id + 3 * x + 7 * y + 11 * t) % 256).toByte
            rgb(p + 1) = ((2 * id + x + 5 * t) % 256).toByte
            rgb(p + 2) = ((id + y + 2 * t) % 256).toByte
            x += 1
          }
          y += 1
        }
        Jpeg.encodeRgb(w, h, rgb)
      }
      VideoRow(id, buildAvi(w, h, frames))
    }
  }

  /** Assemble a minimal standard AVI: RIFF('AVI ') → LIST(hdrl: avih +
    * LIST(strl: strh('vids'/'MJPG') + strf(BITMAPINFOHEADER))) +
    * LIST(movi: '00dc' per frame). Chunk sizes exclude the pad byte;
    * payloads are word-aligned — the parts a lazy writer gets wrong and a
    * real reader must survive. */
  def buildAvi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(fcc: String, body: Array[Byte]): Array[Byte] =
      fcc.getBytes(Ascii) ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes(Ascii) ++ body)

    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++ // usec/frame 25fps
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = "vids".getBytes(Ascii) ++ "MJPG".getBytes(Ascii) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
      le32(1) ++ le32(25) ++ le32(0) ++ le32(frames.length) ++ // scale/rate/len
      le32(maxFrame) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      "MJPG".getBytes(Ascii) ++ le32(w * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = "AVI ".getBytes(Ascii) ++ hdrl ++ movi
    "RIFF".getBytes(Ascii) ++ le32(body.length) ++ body
  }

  // -------------------------------------------------------------- decoder

  /** Frame sampling — the training-data shape (dense video → sparse frame
    * set for captioning/embedding): keep every `stride`-th frame by frame
    * INDEX (frame 0 always survives), a pure row-local filter that
    * composes after [[decodeMjpegAvi]] so only kept frames' features flow
    * downstream. At 100 TB the filter belongs INSIDE the decode loop
    * (skip the Huffman work for dropped frames — the container walk
    * already knows each frame's index before decoding it); kept here as a
    * Dataset combinator so any frame source can use it. */
  def sampleFrames(frames: Dataset[VideoFrame], stride: Int): Dataset[VideoFrame] = {
    require(stride >= 1, s"sampleFrames: stride $stride")
    frames.filter(f => f.frame % stride == 0)
  }

  /** Decode MJPEG AVIs to per-frame channel means. Malformed container or
    * any undecodable/mismatched frame drops the row. */
  def decodeMjpegAvi(media: Dataset[VideoRow]): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try decodeOneAvi(r.id, r.media)
        catch { case scala.util.control.NonFatal(_) => Nil }
      }
    }
  }

  private[multimodal] def decodeOneAvi(id: Long, b: Array[Byte]): Seq[VideoFrame] = {
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String = new String(b, i, 4, Ascii)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "AVI ") return Nil

    var aviW = -1; var aviH = -1; var declaredFrames = -1
    val frameSpans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    // Nested RIFF walk. Depth-capped: legal AVI needs ≤3 levels
    // (top → hdrl/movi → strl / rec ); a forged self-nesting LIST chain
    // must not recurse the stack away.
    def walk(start: Int, endAt: Int, depth: Int): Unit = {
      if (depth > 4) return
      var i = start
      while (i + 8 <= endAt) {
        val cid = tag(i); val sz = u32(i + 4)
        // forged 32-bit size: negative under .toInt or past the buffer
        // would stall or reverse the walk (decodeWav precedent) — any
        // size that doesn't fit ends the walk; the semantic checks below
        // reject whatever is then missing
        if (sz > (endAt - i - 8).toLong) i = endAt
        else {
          if (cid == "LIST" && sz >= 4) {
            val lt = tag(i + 8)
            if (lt == "hdrl" || lt == "strl" || lt == "movi" || lt == "rec ")
              walk(i + 12, i + 8 + sz.toInt, depth + 1)
          } else if (cid == "avih" && sz >= 40) {
            declaredFrames = u32(i + 8 + 16).toInt
            aviW = u32(i + 8 + 32).toInt
            aviH = u32(i + 8 + 36).toInt
          } else if ((cid == "00dc" || cid == "00db") && sz > 0) {
            if (frameSpans.length < MaxFrames) frameSpans += ((i + 8, sz.toInt))
          }
          i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        }
      }
    }
    walk(12, b.length, 0)

    // container semantics: one avih seen, sane dims, declared count in
    // range and EQUAL to the frames actually present (a truncated movi or
    // an inflated header both fail here)
    if (aviW <= 0 || aviH <= 0 || declaredFrames <= 0 ||
        declaredFrames > MaxFrames || frameSpans.length != declaredFrames)
      return Nil

    val out = new scala.collection.mutable.ArrayBuffer[VideoFrame](declaredFrames)
    var t = 0
    while (t < frameSpans.length) {
      val (off, len) = frameSpans(t)
      val fb = java.util.Arrays.copyOfRange(b, off, off + len)
      Jpeg.decodeOne(t.toLong, fb) match {
        // every frame must decode AND match the container's declared dims —
        // a dimension lie in either header invalidates the row
        case Some(f) if f.width == aviW && f.height == aviH =>
          out += VideoFrame(id, t, declaredFrames, f.width, f.height,
            f.mean_r, f.mean_g, f.mean_b)
        case _ => return Nil
      }
      t += 1
    }
    out.toSeq
  }
}
