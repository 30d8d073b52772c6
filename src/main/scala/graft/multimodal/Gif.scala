package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM GIF codec lane — adds the LZW compression family to the
  * codec coverage (DEFLATE: png/gzip; rice: flac; Huffman+DCT: jpeg; zstd:
  * library lane).
  *
  * Encoder ([[syntheticGif]]/[[encode]]): GIF89a with a 256-entry global
  * color table and a REAL LZW compressor — growing dictionary, variable
  * code width (up to 12 bits), clear-code reset at 4096 entries, LSB-first
  * sub-block packing. Decoder ([[decodeGif]]): header + logical screen
  * descriptor, global/local color tables, extension-block skipping, and a
  * full LZW decoder (KwKwK case, width growth, clear/end codes), folding
  * palette-mapped pixels into per-channel means. Subset: non-interlaced
  * single-frame images (the training-corpus case); interlaced rows drop
  * per the coerce-to-null rule rather than decode wrong.
  *
  * Hardening, same stance as PNG/WAV/FLAC: bad magic, truncated streams,
  * forged sub-block lengths, out-of-range LZW codes, index past the
  * palette — all drop the row, never crash or hang (the code stream is
  * length-bounded by the sub-block walk, and the pixel count is bounded by
  * the declared dimensions).
  *
  * Format per the public GIF89a specification; LZW per the spec's
  * variable-code procedure — standard published algorithm, no code taken
  * from any implementation.
  */
object Gif {

  case class GifImage(id: Long, media: Array[Byte])
  case class GifFeatures(id: Long, width: Int, height: Int, n_pixels: Long,
                         mean_r: Double, mean_g: Double, mean_b: Double)

  // palette formulas (SQL-replayable): r=i, g=(2i)%256, b=(255-i)
  private[multimodal] def palR(i: Int): Int = i & 0xff
  private[multimodal] def palG(i: Int): Int = (2 * i) % 256
  private[multimodal] def palB(i: Int): Int = 255 - (i & 0xff)

  /** Deterministic synthetic corpus: dims/pixels from the doc id, pixel
    * index (id + 3x + 7y) % 256 through the formula palette. */
  def syntheticGif(ids: Dataset[Long]): Dataset[GifImage] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (5 + id % 7).toInt; val h = (4 + id % 6).toInt
      val px = Array.tabulate(w * h) { p =>
        val x = p % w; val y = p / w
        ((id + 3 * x + 7 * y) % 256).toInt
      }
      GifImage(id, encode(w, h, px))
    }
  }

  /** Encode indexed pixels (0..255) as a GIF89a stream with the formula
    * palette and real LZW compression. */
  def encode(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, "pixel count != dims")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0xf7) // GCT present, 8-bit resolution, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(palR(i)); out.write(palG(i)); out.write(palB(i)); i += 1 }
    // graphic control extension (exercises the decoder's extension skip)
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); u16(0); out.write(0); out.write(0)
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW min code size
    val code = lzwCompress(pixels, minCodeSize = 8)
    var off = 0
    while (off < code.length) {
      val n = math.min(255, code.length - off)
      out.write(n); out.write(code, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: clear/end codes, growing dictionary, variable code
    * width (up to 12 bits), reset at 4096 entries, LSB-first packing.
    *
    * Width rule, shared verbatim with the decoder: the k-th code after a
    * clear (counting the clear itself) can reference at most table entry
    * `clear + k`, so both sides widen exactly when `clear + k` stops
    * fitting — width is a pure function of the per-side code COUNTER,
    * which makes encoder/decoder sync provable rather than dependent on
    * matching table-growth timing (the classic GIF off-by-one trap). */
  private def lzwCompress(px: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    var width = minCodeSize + 1
    var k = 1
    def emit(code: Int): Unit = {
      while (width < 12 && (1 << width) <= clear + k) width += 1
      acc |= code.toLong << nBits
      nBits += width
      k += 1
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int] // (prefixCode, byte) -> code
    var next = end + 1
    emit(clear)
    k = 1 // the counter (like the decoder's) restarts AFTER a clear code
    var prev = -1
    var i = 0
    while (i < px.length) {
      val c = px(i)
      if (prev < 0) prev = c
      else dict.get((prev, c)) match {
        case Some(code) => prev = code
        case None =>
          emit(prev)
          dict((prev, c)) = next
          next += 1
          if (next >= 4096) {
            emit(clear)
            dict = scala.collection.mutable.HashMap.empty
            next = end + 1; width = minCodeSize + 1; k = 1
          }
          prev = c
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(end)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  /** Decode GIF rows to palette-resolved channel means; malformed rows are
    * dropped (coerce-to-null rule). */
  def decodeGif(media: Dataset[GifImage]): Dataset[GifFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try decodeOne(r.id, r.media)
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[GifFeatures] = {
    if (b.length < 14) return None
    val magic = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (magic != "GIF89a" && magic != "GIF87a") return None
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen dims (per-image descriptor dims are used)
    val packed = b(pos) & 0xff; pos += 3
    var pal: Array[Int] = null // packed rgb per index
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 7) + 1)
      if (pos + 3 * n > b.length) return None
      pal = Array.tabulate(n)(i =>
        ((b(pos + 3 * i) & 0xff) << 16) | ((b(pos + 3 * i + 1) & 0xff) << 8) |
          (b(pos + 3 * i + 2) & 0xff))
      pos += 3 * n
    }
    // block walk
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          pos += 1
        case 0x2c => // image descriptor
          if (pos + 10 > b.length) return None
          val w = u16(pos + 5); val h = u16(pos + 7)
          val ipacked = b(pos + 9) & 0xff
          pos += 10
          // dimension bomb: u16 dims allow 65535² ≈ 4G pixels from a
          // 30-byte forgery — an OutOfMemoryError is FATAL and would kill
          // the task instead of dropping the row. Bytes-proportional budget:
          // LZW's growth phase emits ~n²/2 px from ~1.5n bytes (≈n/3
          // px/byte), topping out near ~2700 px/byte once the 12-bit table
          // saturates — 5000 stays safely past any decodable stream. The
          // global ceiling caps the int pixel plane at 1<<24 entries =
          // 64 MB, bounding the transient allocation a forged-but-plausible
          // header can force.
          if (w <= 0 || h <= 0 ||
              w.toLong * h > math.min(1L << 24, 5000L * b.length)) return None
          if ((ipacked & 0x40) != 0) return None // interlaced: out of subset
          if ((ipacked & 0x80) != 0) {           // local color table wins
            val n = 1 << ((ipacked & 7) + 1)
            if (pos + 3 * n > b.length) return None
            pal = Array.tabulate(n)(i =>
              ((b(pos + 3 * i) & 0xff) << 16) | ((b(pos + 3 * i + 1) & 0xff) << 8) |
                (b(pos + 3 * i + 2) & 0xff))
            pos += 3 * n
          }
          if (pal == null || w <= 0 || h <= 0 || pos >= b.length) return None
          val minCode = b(pos) & 0xff; pos += 1
          if (minCode < 2 || minCode > 11) return None
          // gather the LZW stream from sub-blocks
          val code = new java.io.ByteArrayOutputStream()
          var len = if (pos < b.length) b(pos) & 0xff else return None
          while (len != 0) {
            if (pos + 1 + len > b.length) return None
            code.write(b, pos + 1, len)
            pos += 1 + len
            if (pos >= b.length) return None
            len = b(pos) & 0xff
          }
          val px = lzwDecompress(code.toByteArray, minCode, w * h)
          if (px == null) return None
          var sr = 0L; var sg = 0L; var sb2 = 0L
          var i = 0
          while (i < px.length) {
            val idx = px(i)
            if (idx >= pal.length) return None
            val rgb = pal(idx)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb2 += rgb & 0xff
            i += 1
          }
          val n = (w * h).toDouble
          return Some(GifFeatures(id, w, h, (w * h).toLong,
            sr / n, sg / n, sb2 / n))
        case _ => return None
      }
    }
    None
  }

  /** GIF LZW decode: returns exactly `nPixels` indices or null if the
    * stream is malformed (bad code, early end, wrong pixel count). */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int,
                            nPixels: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Int](nPixels)
    var w = 0
    // dictionary as prefix links: suffix byte + prefix code per entry
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = end + 1
    var width = minCodeSize + 1
    var k = 1 // code counter post-clear — drives width, mirrors the encoder
    var acc = 0L; var nBits = 0; var pos = 0
    var prevCode = -1
    val stack = new Array[Int](4097)
    def readCode(): Int = {
      while (width < 12 && (1 << width) <= clear + k) width += 1
      while (nBits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nBits
        pos += 1; nBits += 8
      }
      val c = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nBits -= width
      k += 1
      c
    }
    def emitChain(code: Int, extra: Int): Boolean = {
      // walk the prefix chain onto a stack, then pop in order
      var sp = 0
      if (extra >= 0) { stack(sp) = extra; sp += 1 }
      var c = code
      var guard = 0
      while (c >= clear + 2) {
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
        guard += 1
        if (guard > 4096) return false // forged cyclic chain
      }
      stack(sp) = c; sp += 1
      while (sp > 0) {
        sp -= 1
        if (w >= nPixels) return false // more pixels than declared
        out(w) = stack(sp); w += 1
      }
      true
    }
    def firstOf(code: Int): Int = {
      var c = code
      var guard = 0
      while (c >= clear + 2) {
        c = prefix(c); guard += 1
        if (guard > 4096) return -1
      }
      c
    }
    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0) return null // truncated
      if (code == clear) {
        next = end + 1; width = minCodeSize + 1; k = 1; prevCode = -1
      } else if (code == end) {
        done = true
      } else if (prevCode < 0) {
        if (code >= clear) return null // first code must be a literal
        if (w >= nPixels) return null
        out(w) = code; w += 1
        prevCode = code
      } else {
        if (code > next || (code >= clear && code < clear + 2) ||
            (code == next && next >= 4096)) return null
        if (code == next) { // KwKwK
          val f = firstOf(prevCode)
          if (f < 0 || !emitChain(prevCode, f)) return null
        } else if (code < clear) {
          if (w >= nPixels) return null
          out(w) = code; w += 1
        } else if (!emitChain(code, -1)) return null
        if (next < 4096) {
          prefix(next) = prevCode
          val f = firstOf(if (code == next) prevCode else code)
          if (f < 0) return null
          suffix(next) = f
          next += 1
        }
        prevCode = code
      }
    }
    if (w != nPixels) null else out
  }
}
