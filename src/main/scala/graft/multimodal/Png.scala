package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL pure-JVM PNG codec (RFC 2083): the native-codec image lane.
  *
  * Where [[Multimodal.decodePpm]] proves the partition-loop decode stage on
  * an uncompressed container, this is the full compressed-image path with
  * no native library: chunk walk with CRC-32 validation, zlib inflate
  * (`java.util.zip.Inflater`), and scanline defiltering including the Paeth
  * predictor — i.e. everything libpng does for 8-bit truecolor short of
  * interlacing. The synthetic encoder cycles ALL five PNG filter types
  * (row y uses type y mod 5), so a decoder that mis-implements any
  * reconstruction function cannot round-trip the fixture.
  *
  * Scope: 8-bit RGB (color type 2), no interlace — the common case for
  * ML-pipeline image shards; other color types are dropped (coerce-to-null
  * engine rule), not mis-decoded.
  *
  * Scale posture: identical to the other decoders — one codec loop per
  * partition via `mapPartitions`, payload bytes never leave the executor,
  * per-row Inflater so a corrupt payload poisons one row, not the
  * partition. Features are formula-replayable, so the gate query `mm_png`
  * carries a full DuckDB value oracle even though DuckDB cannot inflate.
  */
object Png {

  case class PngImage(id: Long, media: Array[Byte])
  case class PngFeatures(id: Long, width: Int, height: Int, n_pixels: Long,
                         mean_r: Double, mean_g: Double, mean_b: Double)

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    * left + up − upleft, ties left > up > upleft. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def putBe32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
    out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 12)
    putBe32(out, data.length.toLong)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    putBe32(out, crc.getValue)
    out.toByteArray
  }

  /** Deterministic 8-bit RGB PNG fixture: pixel (x, y) of image `id` is
    * (R, G, B) = ((id + 3x + 7y) % 256, (2·id + x) % 256, (id + y) % 256)
    * — the same generation formula family as [[Multimodal.syntheticPpm]],
    * under different dimensions — so an oracle replays the expected
    * features while the Spark path round-trips real deflate + filters.
    * Row y is filtered with type y % 5, exercising None/Sub/Up/Average/
    * Paeth in every image taller than 4 rows. */
  def syntheticPng(ids: Dataset[Long]): Dataset[PngImage] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (5 + id % 6).toInt
      val h = (4 + id % 5).toInt
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          rgb(p) = ((id + 3 * x + 7 * y) % 256).toByte
          rgb(p + 1) = ((2 * id + x) % 256).toByte
          rgb(p + 2) = ((id + y) % 256).toByte
          x += 1
        }
        y += 1
      }
      PngImage(id, encodeRgb(w, h, rgb))
    }
  }

  /** Encode raw 8-bit RGB pixels (row-major, 3 bytes/px) as a PNG, row y
    * filtered with type y % 5 — every filter's encode side is exercised on
    * any image taller than 4 rows. Driver- or executor-side (pure
    * function); [[PipelineSpec]] property-tests decode∘encode = identity
    * on arbitrary pixel data. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w*$h*3")
    val bpp = 3
    val stride = w * bpp
    val scan = new java.io.ByteArrayOutputStream(h * (1 + stride))
    var y = 0
    while (y < h) {
      val ft = y % 5
      scan.write(ft)
      var i = 0
      while (i < stride) {
        val x = rgb(y * stride + i) & 0xff
        val a = if (i >= bpp) rgb(y * stride + i - bpp) & 0xff else 0   // left
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0      // up
        val c = if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xff
                else 0                                                  // up-left
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        scan.write(f & 0xff)
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater() // default = zlib wrapper
    defl.setInput(scan.toByteArray); defl.finish()
    val z = new java.io.ByteArrayOutputStream(scan.size() / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = new java.io.ByteArrayOutputStream(13)
    putBe32(ihdr, w.toLong); putBe32(ihdr, h.toLong)
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor RGB
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
    val out = new java.io.ByteArrayOutputStream(z.size() + 64)
    out.write(Signature)
    out.write(chunk("IHDR", ihdr.toByteArray))
    out.write(chunk("IDAT", z.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** REAL PNG decoder: signature check, chunk walk with CRC-32 validation
    * of every chunk, IDAT concatenation, zlib inflate, per-row
    * reconstruction of all five filter types, per-channel means. Anything
    * malformed — bad signature, CRC mismatch, unsupported IHDR, truncated
    * or over-long pixel data — drops the row (coerce-to-null rule). */
  def decodePng(media: Dataset[PngImage]): Dataset[PngFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  // per-row entry point shared with the magic-byte router
  // (Multimodal.sniffAndDecode) — one decoder, every container path
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[PngFeatures] = {
        try {
          if (b.length < 8 || !java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(b, 0, 8), Signature)) None
          else {
            var i = 8
            var w = 0; var h = 0; var headerOk = false; var bad = false
            val idat = new java.io.ByteArrayOutputStream(b.length)
            var done = false
            while (!done && !bad && i + 12 <= b.length) {
              val len = be32(b, i).toInt
              // Overflow-safe bounds check: `i + 12 + len > b.length` wraps
              // negative for forged len near 2³¹ and would pass; rewrite so
              // both operands are non-negative (loop invariant guarantees
              // b.length - i - 12 >= 0).
              if (len < 0 || len > b.length - i - 12) bad = true
              else {
                val typ = new String(b, i + 4, 4,
                  java.nio.charset.StandardCharsets.US_ASCII)
                val crc = new java.util.zip.CRC32
                crc.update(b, i + 4, 4 + len)
                if (crc.getValue != be32(b, i + 8 + len)) bad = true
                else typ match {
                  case "IHDR" =>
                    if (len != 13) bad = true
                    else {
                      w = be32(b, i + 8).toInt; h = be32(b, i + 12).toInt
                      // 8-bit truecolor, deflate, standard filters, no
                      // interlace — AND sane dimensions: a forged header
                      // claiming 2³¹-pixel rows would overflow
                      // h·(1+3w) and crash the allocator below instead of
                      // dropping. Decoded size is also bounded by what the
                      // payload could possibly inflate to (~1032:1 max
                      // deflate ratio ⇒ cheap upper bound via b.length),
                      // so a 100-byte bomb can't request a 2 GB buffer.
                      headerOk = b(i + 16) == 8 && b(i + 17) == 2 &&
                        b(i + 18) == 0 && b(i + 19) == 0 && b(i + 20) == 0 &&
                        w > 0 && h > 0 &&
                        h.toLong * (1L + 3L * w) <= math.min(
                          Int.MaxValue.toLong, 1100L * b.length)
                    }
                  case "IDAT" => idat.write(b, i + 8, len)
                  case "IEND" => done = true
                  case _ => () // ancillary chunks skipped (CRC still checked)
                }
                i += 12 + len
              }
            }
            if (bad || !headerOk || !done) None
            else {
              val stride = w * 3
              val expected = h * (1 + stride)
              val infl = new java.util.zip.Inflater()
              infl.setInput(idat.toByteArray)
              val scan = new Array[Byte](expected)
              var off = 0
              while (off < expected && !infl.finished()) {
                val n = infl.inflate(scan, off, expected - off)
                // All input was set up front, so n == 0 while unfinished
                // means the stream is truncated (needsInput) or stalled on a
                // preset dictionary (FDICT header → needsDictionary, which
                // would otherwise spin this loop forever). Malformed either
                // way: drop the row.
                if (n == 0) { infl.end(); throw new java.io.IOException("stalled") }
                off += n
              }
              val extra = !infl.finished() && infl.inflate(new Array[Byte](1)) > 0
              infl.end()
              if (off != expected || extra) None
              else {
                val bpp = 3
                var sr = 0L; var sg = 0L; var sb = 0L
                val prior = new Array[Byte](stride)
                val cur = new Array[Byte](stride)
                var y = 0
                var filterOk = true
                while (y < h && filterOk) {
                  val base = y * (1 + stride)
                  val ft = scan(base) & 0xff
                  if (ft > 4) filterOk = false
                  else {
                    var j = 0
                    while (j < stride) {
                      val f = scan(base + 1 + j) & 0xff
                      val a = if (j >= bpp) cur(j - bpp) & 0xff else 0
                      val up = prior(j) & 0xff
                      val c = if (j >= bpp) prior(j - bpp) & 0xff else 0
                      val v = ft match {
                        case 0 => f
                        case 1 => f + a
                        case 2 => f + up
                        case 3 => f + (a + up) / 2
                        case 4 => f + paeth(a, up, c)
                      }
                      cur(j) = (v & 0xff).toByte
                      j += 1
                    }
                    var x = 0
                    while (x < w) {
                      sr += cur(x * 3) & 0xff
                      sg += cur(x * 3 + 1) & 0xff
                      sb += cur(x * 3 + 2) & 0xff
                      x += 1
                    }
                    System.arraycopy(cur, 0, prior, 0, stride)
                    y += 1
                  }
                }
                val n = w.toLong * h
                if (!filterOk) None
                else Some(PngFeatures(id, w, h, n,
                  sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
              }
            }
          }
        } catch {
          // NonFatal, not just IO/DataFormat: a malformed payload must drop
          // its own row (coerce-to-null rule), never fail the task — e.g. an
          // ArrayIndexOutOfBounds from a corrupt offset is still one bad row.
          case scala.util.control.NonFatal(_) => None
        }
  }
}
