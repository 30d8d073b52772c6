package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM baseline TIFF codec (TIFF 6.0 baseline RGB): the
  * tag-directory container lane of the codec ladder, and the only one
  * where BYTE ORDER is data — a TIFF declares itself little-endian
  * ("II*\0") or big-endian ("MM\0*") and every integer after the magic
  * obeys that declaration. The fixture emits both, so the decoder's
  * endian handling is verified, not assumed. Everything real corpora trip
  * on in TIFF is here and exercised:
  *
  *  - the IFD (Image File Directory) walk: ascending-tag 12-byte entries
  *    whose value field holds the VALUE when it fits in 4 bytes and an
  *    OFFSET otherwise — and a SHORT-in-entry is LEFT-justified in the
  *    field, so big-endian files read it from the FIRST two bytes (the
  *    classic cross-endian TIFF bug, covered by the MM fixtures);
  *  - multi-strip pixel layout: RowsPerStrip=3 splits every image into
  *    several strips with offset/bytecount ARRAYS (in-entry when one
  *    strip, offset-resident when several) — a short final strip is the
  *    normal case, not an edge case;
  *  - PackBits (compression 32773) on a third of the fixtures: real
  *    run-length decode with the 0x80 noop and the n≥129 repeat branch,
  *    output CAPPED at the strip's expected size (declared-size bomb
  *    guard, the gunzip/zstd precedent);
  *  - forged headers (dims beyond the payload, absurd pixel counts,
  *    out-of-bounds strip offsets, non-baseline photometric/bpp/spp)
  *    DROP the row — the per-codec coerce-to-null rule, spec-tested.
  *
  * Decode is row-local `mapPartitions` like every codec lane: payload
  * bytes never leave the executor, features are a handful of numbers. */
object Tiff {

  case class TiffImage(id: Long, media: Array[Byte])
  case class TiffFeatures(id: Long, width: Int, height: Int,
                          big_endian: Boolean, packbits: Boolean,
                          n_strips: Int, n_pixels: Long,
                          mean_r: Double, mean_g: Double, mean_b: Double)

  /** Bomb guard: total decoded pixels a header may claim. */
  private val MaxPixels = 1 << 24
  /** Bomb guard: IFD entry count a directory may claim. */
  private val MaxIfdEntries = 64

  private val RowsPerStrip = 3

  // ---- endian-aware primitives -------------------------------------------

  private def put16(b: Array[Byte], at: Int, v: Int, be: Boolean): Unit =
    if (be) { b(at) = (v >>> 8).toByte; b(at + 1) = v.toByte }
    else { b(at) = v.toByte; b(at + 1) = (v >>> 8).toByte }

  private def put32(b: Array[Byte], at: Int, v: Int, be: Boolean): Unit =
    if (be) {
      b(at) = (v >>> 24).toByte; b(at + 1) = (v >>> 16).toByte
      b(at + 2) = (v >>> 8).toByte; b(at + 3) = v.toByte
    } else {
      b(at) = v.toByte; b(at + 1) = (v >>> 8).toByte
      b(at + 2) = (v >>> 16).toByte; b(at + 3) = (v >>> 24).toByte
    }

  private def rd16(b: Array[Byte], at: Int, be: Boolean): Int =
    if (be) ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    else (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  private def rd32(b: Array[Byte], at: Int, be: Boolean): Long =
    if (be) (((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL))
    else ((b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24))

  // ---- PackBits ----------------------------------------------------------

  /** Real PackBits encode: maximal repeat runs (≥3, or 2 when not
    * adjacent to a literal run) as (257−n, byte), the rest as literal
    * blocks. Enough to produce genuinely mixed run/literal streams over
    * the formula pixels. */
  private[graft] def packBits(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < src.length) {
      // measure the repeat run at i
      var run = 1
      while (i + run < src.length && run < 128 && src(i + run) == src(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(src(i)); i += run
      } else {
        // literal block: until the next ≥3-repeat or 128 bytes
        val start = i
        var n = 0
        var done = false
        while (!done && i < src.length && n < 128) {
          var r = 1
          while (i + r < src.length && r < 3 && src(i + r) == src(i)) r += 1
          if (r >= 3) done = true
          else { i += 1; n += 1 }
        }
        out.write(n - 1)
        out.write(src, start, n)
      }
    }
    out.toByteArray
  }

  /** PackBits decode with a HARD output cap (`expect` bytes): a stream
    * that tries to inflate past the strip's declared pixel size, or ends
    * short, returns None. */
  private[graft] def unpackBits(b: Array[Byte], off: Int, len: Int,
                                     expect: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expect)
    var i = off
    val end = off + len
    var o = 0
    while (i < end) {
      val n = b(i); i += 1
      if (n == -128) { /* noop */ }
      else if (n >= 0) {
        val cnt = n + 1
        if (i + cnt > end || o + cnt > expect) return None
        System.arraycopy(b, i, out, o, cnt); i += cnt; o += cnt
      } else {
        val cnt = 1 - n // 257 - (n & 0xff)
        if (i >= end || o + cnt > expect) return None
        java.util.Arrays.fill(out, o, o + cnt, b(i)); i += 1; o += cnt
      }
    }
    if (o == expect) Some(out) else None
  }

  // ---- fixture -----------------------------------------------------------

  /** Deterministic TIFF fixture: dims (5 + id % 8) × (4 + id % 5), RGB8
    * chunky, RowsPerStrip=3 (so every image is multi-strip with a short
    * tail strip), BIG-endian for even ids, PackBits for id % 3 == 0,
    * pixel (x, y) from the shared formula family (r = (id+3x+7y)%256,
    * g = (2id+x)%256, b = (id+y)%256) — the oracle replays features from
    * the formula while the Spark path really encodes and re-parses the
    * directory structure. */
  def syntheticTiff(ids: Dataset[Long]): Dataset[TiffImage] = {
    import ids.sparkSession.implicits._
    ids.map(id => TiffImage(id, encodeOne(id)))
  }

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val w = (5 + id % 8).toInt
    val h = (4 + id % 5).toInt
    val be = id % 2 == 0
    val pb = id % 3 == 0
    val nStrips = (h + RowsPerStrip - 1) / RowsPerStrip
    // raw strips
    val strips = (0 until nStrips).map { s =>
      val rows = math.min(RowsPerStrip, h - s * RowsPerStrip)
      val raw = new Array[Byte](rows * w * 3)
      var p = 0
      var r = 0
      while (r < rows) {
        val y = s * RowsPerStrip + r
        var x = 0
        while (x < w) {
          raw(p) = ((id + 3 * x + 7 * y) % 256).toByte
          raw(p + 1) = ((2 * id + x) % 256).toByte
          raw(p + 2) = ((id + y) % 256).toByte
          p += 3; x += 1
        }
        r += 1
      }
      if (pb) packBits(raw) else raw
    }
    // layout: header(8) | strip data | bitsPerSample(6) | [stripOffsets,
    // stripByteCounts arrays when nStrips > 1] | IFD
    val dataOff = 8
    val stripOffs = strips.scanLeft(dataOff)(_ + _.length)
    val bpsOff = stripOffs.last
    val arraysOff = bpsOff + 6
    val needArrays = nStrips > 1
    val ifdOff = arraysOff + (if (needArrays) 8 * nStrips else 0)
    val nEntries = 10
    val total = ifdOff + 2 + 12 * nEntries + 4
    val buf = new Array[Byte](total)
    if (be) { buf(0) = 'M'; buf(1) = 'M'; buf(2) = 0; buf(3) = 42 }
    else { buf(0) = 'I'; buf(1) = 'I'; buf(2) = 42; buf(3) = 0 }
    put32(buf, 4, ifdOff, be)
    strips.zipWithIndex.foreach { case (sdata, i) =>
      System.arraycopy(sdata, 0, buf, stripOffs(i), sdata.length)
    }
    put16(buf, bpsOff, 8, be); put16(buf, bpsOff + 2, 8, be)
    put16(buf, bpsOff + 4, 8, be)
    if (needArrays) {
      (0 until nStrips).foreach { i =>
        put32(buf, arraysOff + 4 * i, stripOffs(i), be)
        put32(buf, arraysOff + 4 * nStrips + 4 * i, strips(i).length, be)
      }
    }
    // IFD: entry(tag, type, count, value) — SHORT values LEFT-justified
    var e = ifdOff
    put16(buf, e, nEntries, be); e += 2
    def entry(tag: Int, typ: Int, count: Int)(writeValue: Int => Unit): Unit = {
      put16(buf, e, tag, be); put16(buf, e + 2, typ, be)
      put32(buf, e + 4, count, be)
      writeValue(e + 8)
      e += 12
    }
    val T_SHORT = 3; val T_LONG = 4
    entry(256, T_LONG, 1)(at => put32(buf, at, w, be))
    entry(257, T_LONG, 1)(at => put32(buf, at, h, be))
    entry(258, T_SHORT, 3)(at => put32(buf, at, bpsOff, be))
    entry(259, T_SHORT, 1)(at => put16(buf, at, if (pb) 32773 else 1, be))
    entry(262, T_SHORT, 1)(at => put16(buf, at, 2, be)) // RGB
    entry(273, T_LONG, nStrips) { at =>
      if (needArrays) put32(buf, at, arraysOff, be)
      else put32(buf, at, stripOffs(0), be)
    }
    entry(277, T_SHORT, 1)(at => put16(buf, at, 3, be))
    entry(278, T_LONG, 1)(at => put32(buf, at, RowsPerStrip, be))
    entry(279, T_LONG, nStrips) { at =>
      if (needArrays) put32(buf, at, arraysOff + 4 * nStrips, be)
      else put32(buf, at, strips(0).length, be)
    }
    entry(284, T_SHORT, 1)(at => put16(buf, at, 1, be)) // chunky
    put32(buf, e, 0, be) // next IFD
    buf
  }

  /** Router predicate: the 4-byte magic is strong (contains a NUL either
    * way), so no extra field check is needed. */
  private[multimodal] def looksLikeTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

  def decodeTiff(media: Dataset[TiffImage]): Dataset[TiffFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  /** Per-row entry point (shared with the magic-byte router). Baseline
    * subset: RGB8 chunky, compression 1 or PackBits; anything else — or
    * any forged/out-of-bounds field — drops the row. */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[TiffFeatures] = {
    if (!looksLikeTiff(b)) return None
    val be = b(0) == 'M'
    val ifdOff = rd32(b, 4, be)
    if (ifdOff < 8 || ifdOff + 2 > b.length) return None
    val n = rd16(b, ifdOff.toInt, be)
    if (n <= 0 || n > MaxIfdEntries) return None
    if (ifdOff + 2 + 12L * n + 4 > b.length) return None
    // collect (tag -> (type, count, valueFieldAt))
    var tags = Map.empty[Int, (Int, Long, Int)]
    var i = 0
    while (i < n) {
      val at = ifdOff.toInt + 2 + 12 * i
      tags += rd16(b, at, be) -> ((rd16(b, at + 2, be), rd32(b, at + 4, be), at + 8))
      i += 1
    }
    val T_SHORT = 3; val T_LONG = 4
    // scalar value: SHORT is left-justified in the field, LONG fills it
    def scalar(tag: Int): Option[Long] = tags.get(tag).flatMap {
      case (T_SHORT, 1L, at) => Some(rd16(b, at, be).toLong)
      case (T_LONG, 1L, at) => Some(rd32(b, at, be))
      case _ => None
    }
    // array of SHORT/LONG: in the value field when it fits, else at offset
    def vector(tag: Int): Option[IndexedSeq[Long]] = tags.get(tag).flatMap {
      case (typ, cnt, at) if (typ == T_SHORT || typ == T_LONG) && cnt >= 1 && cnt <= 65535 =>
        val sz = if (typ == T_SHORT) 2 else 4
        val base =
          if (cnt * sz <= 4) at.toLong
          else rd32(b, at, be)
        if (base < 0 || base + cnt * sz > b.length) None
        else Some((0 until cnt.toInt).map(k =>
          if (typ == T_SHORT) rd16(b, (base + sz * k).toInt, be).toLong
          else rd32(b, (base + sz * k).toInt, be)))
      case _ => None
    }
    val parsed = for {
      w <- scalar(256) if w > 0 && w <= Int.MaxValue
      h <- scalar(257) if h > 0 && h <= Int.MaxValue && w * h <= MaxPixels
      compression <- scalar(259) if compression == 1 || compression == 32773
      photometric <- scalar(262) if photometric == 2
      spp <- scalar(277) if spp == 3
      bps <- vector(258) if bps == IndexedSeq(8L, 8L, 8L)
      rps <- scalar(278) if rps > 0
      offs <- vector(273)
      counts <- vector(279) if counts.length == offs.length
      nStrips = ((h + rps - 1) / rps).toInt
      if offs.length == nStrips
    } yield (w.toInt, h.toInt, compression == 32773, rps, offs, counts, nStrips)
    parsed.flatMap { case (w, h, pb, rps, offs, counts, nStrips) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var s = 0
      var bad = false
      while (s < nStrips && !bad) {
        val rows = math.min(rps, h - s.toLong * rps).toInt
        val expect = rows * w * 3
        val off = offs(s); val len = counts(s)
        if (off < 0 || len < 0 || off + len > b.length) bad = true
        else {
          val raw: Option[Array[Byte]] =
            if (pb) unpackBits(b, off.toInt, len.toInt, expect)
            else if (len != expect) None // forged-dims guard
            else Some(java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt))
          raw match {
            case None => bad = true
            case Some(r) =>
              var p = 0
              while (p < expect) {
                sr += (r(p) & 0xff); sg += (r(p + 1) & 0xff); sb += (r(p + 2) & 0xff)
                p += 3
              }
          }
        }
        s += 1
      }
      if (bad) None
      else {
        val np = w.toLong * h
        Some(TiffFeatures(id, w, h, b(0) == 'M', pb, nStrips, np,
          sr.toDouble / np, sg.toDouble / np, sb.toDouble / np))
      }
    }
  }
}
