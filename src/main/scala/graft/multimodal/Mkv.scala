package graft.multimodal

import org.apache.spark.sql.Dataset

/** MATROSKA / EBML METADATA lane (RFC 8794 EBML + the public Matroska
  * element registry) — the OTHER mainstream video container next to
  * [[Mp4Meta]]'s ISO-BMFF, with a genuinely different structural
  * discipline: where BMFF is fixed-width length-prefixed boxes, EBML is
  * VARIABLE-WIDTH integers everywhere. Real structure, real traps:
  *
  *  - VINT parsing: the leading byte's first set bit gives the width
  *    (1..8 bytes). Element IDs keep their marker bits (0x1A45DFA3 is a
  *    4-byte ID read verbatim); SIZES strip the marker. A zero leading
  *    byte means width > 8 — invalid, drops the row;
  *  - PADDED sizes are legal: the same size value may be encoded in more
  *    bytes than minimal (the fixture emits 2-byte sizes where 1 would
  *    do) — a reader that assumes minimal encoding desyncs;
  *  - the UNKNOWN-SIZE vint (all value bits set) is legal ONLY on the
  *    Segment (it then extends to end-of-stream — how live-streamed
  *    Matroska is written); on any other element it drops the row;
  *  - Duration is a FLOAT element (4-byte) in TimestampScale (ns) ticks;
  *    duration_ms = ticks · scale / 10⁶ in integer math after the exact
  *    float→long conversion (fixture values are integer-valued floats);
  *  - containers (EBML, Segment, Info, Tracks, TrackEntry, Video) recurse
  *    by byte range; leaf payloads are skipped by size, never scanned;
  *  - forged sizes past EOF, element counts past the bomb cap, and
  *    missing mandatory elements (no Segment / no video track dims) drop.
  *
  * Decode is row-local `mapPartitions` like every codec lane. */
object Mkv {

  case class MkvClip(id: Long, media: Array[Byte])
  case class MkvFeatures(id: Long, n_tracks: Int, width: Int, height: Int,
                         timestamp_scale: Long, duration_ms: Long,
                         n_elements: Long)

  private val MaxElements = 10000

  // ---- element IDs (verbatim, marker bits included) ----
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL

  // ---------- encoding ----------

  private def vintWidth(firstByte: Int): Int = {
    var w = 1
    var mask = 0x80
    while (mask != 0 && (firstByte & mask) == 0) { w += 1; mask >>= 1 }
    if (mask == 0) -1 else w
  }

  /** Encode `v` as a size vint in exactly `w` bytes (marker + value). */
  private def sizeVint(v: Long, w: Int): Array[Byte] = {
    val out = new Array[Byte](w)
    var x = v | (1L << (7 * w)) // marker bit
    var i = w - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  private def minSizeWidth(v: Long): Int = {
    var w = 1
    while (w < 8 && v >= (1L << (7 * w)) - 1) w += 1 // all-ones is reserved
    w
  }

  private def idBytes(id: Long): Array[Byte] = {
    val w = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
            else if (id <= 0xffffffL) 3 else 4
    (0 until w).map(i => ((id >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
  }

  private def elem(id: Long, payload: Array[Byte], padSize: Boolean = false): Array[Byte] = {
    val w = minSizeWidth(payload.length.toLong) + (if (padSize) 1 else 0)
    idBytes(id) ++ sizeVint(payload.length.toLong, w) ++ payload
  }

  private def uintPayload(v: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && v >= (1L << (8 * w))) w += 1
    (0 until w).map(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
  }

  private def floatPayload(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array(((bits >> 24) & 0xff).toByte, ((bits >> 16) & 0xff).toByte,
      ((bits >> 8) & 0xff).toByte, (bits & 0xff).toByte)
  }

  /** Fixture shapes shared with the oracle:
    * w = 320 + 16·(id%8), h = 240 + 8·(id%6), scale = 10⁶·(1+id%3) ns,
    * duration ticks = 500·(1+id%7) → ms = ticks·(1+id%3),
    * tracks = 1 + id%2 (video [+ audio]), elements = 13 + 3·(id%2).
    * The Segment uses the UNKNOWN-SIZE vint when id%4==0; the Video
    * element pads its size encoding when id%3==0. */
  def shape(id: Long): (Int, Int, Long, Long, Int, Long) = {
    val w = 320 + 16 * (id % 8).toInt
    val h = 240 + 8 * (id % 6).toInt
    val scaleFactor = 1 + id % 3
    val ticks = 500L * (1 + id % 7)
    val nTracks = (1 + id % 2).toInt
    val nElements = 13L + 3L * (id % 2)
    (w, h, 1000000L * scaleFactor, ticks * scaleFactor, nTracks, nElements)
  }

  def syntheticMkv(ids: Dataset[Long]): Dataset[MkvClip] = {
    import ids.sparkSession.implicits._
    ids.map(id => MkvClip(id, encodeOne(id)))
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val (w, h, scale, _, nTracks, _) = shape(id)
    val ticks = 500L * (1 + id % 7)
    val ebml = elem(IdEbml, elem(IdDocType, "matroska".getBytes("US-ASCII")))
    val info = elem(IdInfo,
      elem(IdTimestampScale, uintPayload(scale)) ++
        elem(IdDuration, floatPayload(ticks.toFloat)))
    val videoTrack = elem(IdTrackEntry,
      elem(IdTrackNumber, uintPayload(1L)) ++
        elem(IdTrackType, uintPayload(1L)) ++ // 1 = video
        elem(IdVideo,
          elem(IdPixelWidth, uintPayload(w.toLong)) ++
            elem(IdPixelHeight, uintPayload(h.toLong)),
          padSize = id % 3 == 0))
    val audioTrack =
      if (nTracks > 1)
        elem(IdTrackEntry,
          elem(IdTrackNumber, uintPayload(2L)) ++
            elem(IdTrackType, uintPayload(2L))) // 2 = audio
      else Array.emptyByteArray
    val tracks = elem(IdTracks, videoTrack ++ audioTrack)
    val segPayload = info ++ tracks
    val segment =
      if (id % 4 == 0) // unknown-size segment: runs to end-of-stream
        idBytes(IdSegment) ++ Array(0xff.toByte) ++ segPayload
      else elem(IdSegment, segPayload)
    ebml ++ segment
  }

  /** Router predicate: the EBML magic 0x1A45DFA3 at offset 0. */
  private[multimodal] def looksLikeMkv(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x1A && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xDF && (b(3) & 0xff) == 0xA3

  def decodeMkv(media: Dataset[MkvClip]): Dataset[MkvFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  // ---------- decoding ----------

  private final class State {
    var count = 0L
    var nTracks = 0
    var width = -1
    var height = -1
    var scale = -1L
    var durTicks = -1.0
  }

  /** Parse (id, size, payloadFrom, payloadTo, nextAt) at `at`; size == -1
    * means the legal unknown-size form. None on malformed vints/bounds. */
  private def header(b: Array[Byte], at: Int, limit: Int): Option[(Long, Long, Int, Int)] = {
    if (at >= limit) return None
    val iw = vintWidth(b(at) & 0xff)
    if (iw < 1 || iw > 4 || at + iw > limit) return None
    var id = 0L
    (0 until iw).foreach(i => id = (id << 8) | (b(at + i) & 0xffL))
    val sAt = at + iw
    if (sAt >= limit) return None
    val sw = vintWidth(b(sAt) & 0xff)
    if (sw < 1 || sw > 8 || sAt + sw > limit) return None
    var raw = (b(sAt) & 0xffL) & ((1L << (8 - sw)) - 1)
    (1 until sw).foreach(i => raw = (raw << 8) | (b(sAt + i) & 0xffL))
    val unknown = raw == (1L << (7 * sw)) - 1 // all value bits set
    val size = if (unknown) -1L else raw
    Some((id, size, sAt + sw, at))
  }

  private def readUint(b: Array[Byte], from: Int, to: Int): Option[Long] = {
    if (to - from < 1 || to - from > 8) return None
    var v = 0L
    (from until to).foreach(i => v = (v << 8) | (b(i) & 0xffL))
    Some(v)
  }

  private val Containers =
    Set(IdEbml, IdSegment, IdInfo, IdTracks, IdTrackEntry, IdVideo)

  /** Hard cap on container nesting. Legal Matroska nests ~5 deep
    * (Segment→Tracks→TrackEntry→Video); a forged payload of ~10k nested
    * 2-byte container headers would otherwise recurse to MaxElements depth
    * and kill the task with an uncatchable StackOverflowError (ADVICE
    * r13). 64 is absurdly generous for any real file. */
  private val MaxDepth = 64

  /** Walk [from, to); `depth0` true only at the top level (where Segment
    * may be unknown-size). Returns false on any structural violation. */
  private def walk(b: Array[Byte], from: Int, to: Int, st: State,
                   topLevel: Boolean, depth: Int = 0): Boolean = {
    if (depth > MaxDepth) return false
    var i = from
    while (i < to) {
      val h = header(b, i, to).getOrElse(return false)
      val (id, size, pFrom, _) = h
      st.count += 1
      if (st.count > MaxElements) return false
      val pTo =
        if (size < 0) {
          // unknown size: ONLY the Segment, ONLY at top level — it then
          // extends to the end of the stream (the live-remux form)
          if (id != IdSegment || !topLevel) return false
          to
        } else {
          if (size > (to - pFrom).toLong) return false // size past bounds
          pFrom + size.toInt
        }
      if (Containers(id)) {
        if (id == IdTrackEntry) st.nTracks += 1
        if (!walk(b, pFrom, pTo, st, topLevel = false, depth + 1)) return false
      } else id match {
        case IdTimestampScale =>
          st.scale = readUint(b, pFrom, pTo).getOrElse(return false)
        case IdDuration =>
          if (pTo - pFrom == 4) {
            var bits = 0
            (pFrom until pTo).foreach(k => bits = (bits << 8) | (b(k) & 0xff))
            st.durTicks = java.lang.Float.intBitsToFloat(bits).toDouble
          } else if (pTo - pFrom == 8) {
            var bits = 0L
            (pFrom until pTo).foreach(k => bits = (bits << 8) | (b(k) & 0xffL))
            st.durTicks = java.lang.Double.longBitsToDouble(bits)
          } else return false
        case IdPixelWidth =>
          st.width = readUint(b, pFrom, pTo).getOrElse(return false).toInt
        case IdPixelHeight =>
          st.height = readUint(b, pFrom, pTo).getOrElse(return false).toInt
        case _ => () // skip unknown leaves by size — the EBML contract
      }
      i = pTo
    }
    i == to
  }

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[MkvFeatures] = {
    if (!looksLikeMkv(b)) return None
    val st = new State
    // Try = defense-in-depth against residual exceptions on forged bytes
    // (the Pdf/Ttf convention); the structural walk itself returns false
    // on every known violation, this catches the unknown ones.
    if (!scala.util.Try(walk(b, 0, b.length, st, topLevel = true))
      .getOrElse(false)) return None
    // mandatory structure: a Segment with scale, an integer-valued
    // duration, and a video track with both dims
    if (st.scale <= 0 || st.durTicks < 0 || st.width <= 0 || st.height <= 0)
      return None
    if (st.durTicks != math.rint(st.durTicks)) return None // fixture contract
    val durMs = st.durTicks.toLong * st.scale / 1000000L
    Some(MkvFeatures(id, st.nTracks, st.width, st.height, st.scale, durMs,
      st.count))
  }
}
