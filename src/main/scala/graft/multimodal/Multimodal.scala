package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus a decode/feature-extract stage.
  *
  * Decode paths: [[decodePpm]] (binary-PPM P6 image) and [[decodeWav]]
  * (RIFF PCM16 audio) are REAL pure-JVM decoders — header/chunk parse +
  * payload fold — proving the partition-loop decode stage end-to-end with
  * no native codec, one per modality.
  * [[decodeFeatures]] remains the stand-in for formats that need a native
  * library (JPEG/FLAC/H.264 — not in this container); its Spark-side shape
  * (schema, per-partition batching, mapPartitions signature) is identical.
  * Partitioning advice: media rows are wide; keep
  * `spark.sql.files.maxPartitionBytes` at default 128 MB so a partition of
  * ~100 KB payloads stays ~1000 rows, and never collect payloads.
  */
object Multimodal {

  case class MediaRow(id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int)
  case class MediaFeatures(id: Long, n_bytes: Int, format: String,
                           fingerprint: Long, brightness: Double)

  /** Wrap a text corpus as a binary media table (UTF-8 payload standing in
    * for encoded media) with a typed metadata struct. */
  def attachBinary(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).cast("long").as("id"),
      encode(col(text), "UTF-8").as("media"),
      struct(
        lit("utf8").as("format"),
        length(encode(col(text), "UTF-8")).as("n_bytes"),
        lit(0).as("width"),
        lit(0).as("height")).as("meta"))

  case class PpmImage(id: Long, media: Array[Byte])
  case class PpmHistRow(id: Long, bin: Int, r_count: Long, g_count: Long,
                        b_count: Long)
  case class PpmFeatures(id: Long, width: Int, height: Int, n_pixels: Long,
                         mean_r: Double, mean_g: Double, mean_b: Double)

  /** Deterministic binary-PPM (P6) fixture: header `P6\n{w} {h}\n255\n`
    * followed by w·h RGB triples, all derived from the id — so an oracle can
    * replay the expected features from the generation formula while the
    * Spark path actually round-trips encode → parse. */
  def syntheticPpm(ids: Dataset[Long]): Dataset[PpmImage] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val buf = new Array[Byte](header.length + w * h * 3)
      System.arraycopy(header, 0, buf, 0, header.length)
      var p = header.length
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          buf(p) = ((id + 3 * x + 7 * y) % 256).toByte
          buf(p + 1) = ((2 * id + x) % 256).toByte
          buf(p + 2) = ((id + y) % 256).toByte
          p += 3; x += 1
        }
        y += 1
      }
      PpmImage(id, buf)
    }
  }

  /** REAL pure-JVM decoder for binary PPM (P6): parses the header (magic,
    * `#` comments, whitespace-separated width/height/maxval), then folds the
    * RGB payload into per-channel means — the feature-extraction stage of an
    * image pipeline, with no native codec needed. Malformed payloads are
    * dropped (coerce-to-null engine rule; a production variant would route
    * them to a quarantine sink). One decoder loop per partition, payload
    * bytes never leave the executor. */
  def decodePpm(media: Dataset[PpmImage]): Dataset[PpmFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOnePpm(r.id, r.media)))
  }

  /** P6 header parse: (width, height, payload offset), None on anything
    * malformed — magic, maxval≠255, non-positive dims, short payload.
    * Shared by the decode and resize lanes. */
  private def parseP6(b: Array[Byte]): Option[(Int, Int, Int)] = {
        var i = 0
        // token reader: skips whitespace and # comments between header fields
        def nextToken(): String = {
          while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\r' || b(i) == '\t' || b(i) == '#')) {
            if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
            else i += 1
          }
          val s = i
          while (i < b.length && b(i) != ' ' && b(i) != '\n' && b(i) != '\r' && b(i) != '\t') i += 1
          new String(b, s, i - s, java.nio.charset.StandardCharsets.US_ASCII)
        }
        try {
          if (nextToken() != "P6") None
          else {
            val w = nextToken().toInt
            val h = nextToken().toInt
            val maxval = nextToken().toInt
            i += 1 // single whitespace byte after maxval per the P6 spec
            if (maxval != 255 || w <= 0 || h <= 0 || b.length - i < w.toLong * h * 3) None
            else Some((w, h, i))
          }
        } catch { case _: NumberFormatException => None }
  }

  // per-row entry point shared with the magic-byte router ([[sniffAndDecode]])
  private[multimodal] def decodeOnePpm(id: Long, b: Array[Byte]): Option[PpmFeatures] =
    parseP6(b).map { case (w, h, off) =>
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var p = off
      val end = off + n.toInt * 3
      while (p < end) {
        sr += (b(p) & 0xff); sg += (b(p + 1) & 0xff); sb += (b(p + 2) & 0xff)
        p += 3
      }
      PpmFeatures(id, w, h, n, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

  /** Per-channel COLOR HISTOGRAMS over the real PPM decode — the dataset
    * color-statistics pass CV pipelines run before normalization (channel
    * means/stds come from exactly these exact integer bins). Row-local:
    * one decode walk fills `bins` fixed-width counters per channel, then
    * emits one row per (image, bin). Counts are exact integers, so the
    * lane hash-compares cross-engine. Undecodable rows drop. */
  def channelHistogram(media: Dataset[PpmImage], bins: Int = 8): Dataset[PpmHistRow] = {
    import media.sparkSession.implicits._
    require(256 % bins == 0, s"bins must divide 256, got $bins")
    val width = 256 / bins
    media.mapPartitions(_.flatMap { r =>
      parseP6(r.media).toSeq.flatMap { case (w, h, off) =>
        val cr = new Array[Long](bins)
        val cg = new Array[Long](bins)
        val cb = new Array[Long](bins)
        var p = off
        val end = off + w * h * 3
        while (p < end) {
          cr((r.media(p) & 0xff) / width) += 1
          cg((r.media(p + 1) & 0xff) / width) += 1
          cb((r.media(p + 2) & 0xff) / width) += 1
          p += 3
        }
        (0 until bins).map(bin => PpmHistRow(r.id, bin, cr(bin), cg(bin), cb(bin)))
      }
    })
  }

  /** REAL image resize (nearest-neighbor) on the PPM lane: parse → sample
    * the source pixel at (sx, sy) = (x·srcW DIV dstW, y·srcH DIV dstH) →
    * re-encode P6 bytes. Pure integer index arithmetic, so the resized
    * image is an EXACT function of the source and the `mm_resize` oracle
    * replays the generation formula at the sampled coordinates — up- and
    * down-scale both covered (dst needn't divide src). Row-local
    * mapPartitions; bytes never leave the executor; undecodable rows drop
    * (coerce-to-null engine rule). Box/bilinear filtering would change
    * only the kernel, not this plumbing. */
  def resizePpm(media: Dataset[PpmImage], dstW: Int, dstH: Int): Dataset[PpmImage] = {
    import media.sparkSession.implicits._
    require(dstW > 0 && dstH > 0, s"resizePpm: bad target ${dstW}x$dstH")
    media.mapPartitions(_.flatMap(r => resizeOnePpm(r.id, r.media, dstW, dstH)))
  }

  private[multimodal] def resizeOnePpm(id: Long, b: Array[Byte],
                                       dstW: Int, dstH: Int): Option[PpmImage] =
    parseP6(b).map { case (w, h, off) =>
      val header = s"P6\n$dstW $dstH\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + dstW * dstH * 3)
      System.arraycopy(header, 0, out, 0, header.length)
      var p = header.length
      var y = 0
      while (y < dstH) {
        val sy = y.toLong * h / dstH
        var x = 0
        while (x < dstW) {
          val sx = x.toLong * w / dstW
          val src = off + ((sy * w + sx) * 3).toInt
          out(p) = b(src); out(p + 1) = b(src + 1); out(p + 2) = b(src + 2)
          p += 3; x += 1
        }
        y += 1
      }
      PpmImage(id, out)
    }

  case class AHash(id: Long, width: Int, height: Int,
                   hash_lo: Long, hash_hi: Long, n_set: Long)

  /** Average-hash perceptual image fingerprint (aHash) — the image
    * near-dup primitive every multimodal training pipeline runs before
    * minhash-style bucketing on the hashes: 8×8 nearest-neighbor sample
    * (the SAME (x·w) DIV 8 map as [[resizePpm]]), integer grayscale
    * r+g+b per cell, bit set when the cell outshines the mean.
    *
    * Exactness: the mean threshold is CROSS-MULTIPLIED (64·gray > Σgray —
    * never a division), and bit 63 would overflow a signed 64-bit
    * accumulator, so the 64 bits ship as two 32-bit halves (`hash_lo` =
    * bits 0–31, `hash_hi` = bits 32–63, row-major y·8+x). All integers —
    * the oracle replays the generation formula AT the sampled
    * coordinates, like mm_resize. Row-local mapPartitions lane. */
  def aHashPpm(media: Dataset[PpmImage]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      parseP6(r.media).map { case (w, h, off) =>
        val gray = new Array[Long](64)
        var s = 0L
        var i = 0
        while (i < 64) {
          val sy = (i / 8).toLong * h / 8
          val sx = (i % 8).toLong * w / 8
          val p = off + ((sy * w + sx) * 3).toInt
          val g = (r.media(p) & 0xff).toLong +
            (r.media(p + 1) & 0xff) + (r.media(p + 2) & 0xff)
          gray(i) = g; s += g; i += 1
        }
        var lo = 0L; var hi = 0L; var n = 0L
        i = 0
        while (i < 64) {
          if (gray(i) * 64 > s) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            n += 1
          }
          i += 1
        }
        AHash(r.id, w, h, lo, hi, n)
      }
    })
  }

  /** Difference-hash (dHash) — [[aHashPpm]]'s gradient sibling: a 9×8
    * nearest-neighbor sample, bit i set when cell (x, y) is STRICTLY
    * brighter than its right neighbor (x+1, y). Comparing ADJACENT cells
    * instead of the global mean makes the hash invariant to brightness
    * AND (monotone) contrast changes — the stronger perceptual-dup
    * equivalence. All integer compares; same two-half packing. */
  def dHashPpm(media: Dataset[PpmImage]): Dataset[AHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      parseP6(r.media).map { case (w, h, off) =>
        def gray(gx: Long, gy: Long): Long = {
          val sy = gy * h / 8
          val sx = gx * w / 9
          val p = off + ((sy * w + sx) * 3).toInt
          (r.media(p) & 0xff).toLong + (r.media(p + 1) & 0xff) + (r.media(p + 2) & 0xff)
        }
        var lo = 0L; var hi = 0L; var n = 0L
        var i = 0
        while (i < 64) {
          val (x, y) = (i % 8, i / 8)
          if (gray(x, y) > gray(x + 1, y)) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
            n += 1
          }
          i += 1
        }
        AHash(r.id, w, h, lo, hi, n)
      }
    })
  }

  /** Compressed-codec lane: gzip (RFC 1952) via `java.util.zip` — a REAL
    * compressed container with a pure-JVM decoder, standing where
    * JPEG/PNG/FLAC would in production (same plumbing: opaque binary in,
    * per-partition streaming decode, bytes never leave the executor).
    * One deflater/inflater per row keeps rows independent — a decode
    * failure poisons one row, not the partition. */
  def gzip(media: Dataset[PpmImage]): Dataset[PpmImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val bos = new java.io.ByteArrayOutputStream(r.media.length / 2 + 64)
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(r.media); gz.close()
        PpmImage(r.id, bos.toByteArray)
      }
    }
  }

  /** zstd compression lane — the codec a 100 TB corpus actually sits in
    * (parquet/ORC page compression, shard archives). Row-local like
    * [[gzip]]; uses the zstd-jni shipped in Spark's own classpath. */
  def zstd(media: Dataset[PpmImage], level: Int = 3): Dataset[PpmImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => PpmImage(r.id, com.github.luben.zstd.Zstd.compress(r.media, level)))
    }
  }

  /** zstd decompression; malformed rows drop (coerce-to-null). Bomb-safe
    * by frame header: zstd frames declare their content size up front, so
    * a row whose DECLARED size exceeds `maxBytes` — or that hides the size
    * (streaming frames of unknown length: exactly how a bomb dodges a
    * declared-size check) — is dropped before any allocation, and the
    * one-shot decompress can never allocate past the declaration. */
  def unzstd(media: Dataset[PpmImage],
             maxBytes: Int = 64 << 20): Dataset[PpmImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val sz = com.github.luben.zstd.Zstd.getFrameContentSize(r.media)
          if (sz < 0 || sz > maxBytes) None
          else Some(PpmImage(r.id,
            com.github.luben.zstd.Zstd.decompress(r.media, sz.toInt)))
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Streaming gunzip; malformed payloads are dropped (coerce-to-null
    * engine rule, same stance as [[decodePpm]]). `maxBytes` caps the
    * decompressed size per row: deflate expands up to ~1000:1, so without
    * a cap a KB-sized bomb row would allocate GBs inside an executor —
    * rows that blow the cap are dropped, not truncated (a truncated
    * payload masquerading as valid is worse than an absent one). */
  def gunzip(media: Dataset[PpmImage],
             maxBytes: Int = 64 << 20): Dataset[PpmImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(r.media))
          val bos = new java.io.ByteArrayOutputStream(
            math.min(r.media.length * 2 + 64, maxBytes))
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          var over = false
          while (n >= 0 && !over) {
            if (bos.size() + n > maxBytes) over = true
            else { bos.write(buf, 0, n); n = in.read(buf) }
          }
          in.close()
          if (over) None else Some(PpmImage(r.id, bos.toByteArray))
        } catch { case _: java.io.IOException => None }
      }
    }
  }

  case class WavAudio(id: Long, media: Array[Byte])
  case class WavFeatures(id: Long, sample_rate: Int, n_samples: Long,
                         mean_amp: Double, peak_amp: Long)

  /** Deterministic RIFF/WAVE fixture (PCM16 mono little-endian, the real
    * 44-byte canonical header + payload): sample rate, length, and every
    * sample derive from the id, so an oracle can replay the expected
    * features from the generation formula while the Spark path actually
    * round-trips encode → chunk-walk → decode.
    * sample j = ((id·31 + j·17) mod 4096) − 2048 — int16-safe, integer
    * math end to end. */
  def syntheticWav(ids: Dataset[Long]): Dataset[WavAudio] = {
    import ids.sparkSession.implicits._
    ids.map { id =>
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val rate = (8000 + (id % 4) * 4000).toInt
      val n = (64 + id % 57).toInt
      val dataSize = n * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(ascii)).putInt(36 + dataSize).put("WAVE".getBytes(ascii))
      buf.put("fmt ".getBytes(ascii)).putInt(16)
        .putShort(1).putShort(1)                  // PCM, mono
        .putInt(rate).putInt(rate * 2)            // byte rate = rate·block
        .putShort(2).putShort(16)                 // block align, bits
      buf.put("data".getBytes(ascii)).putInt(dataSize)
      var j = 0
      while (j < n) {
        buf.putShort((((id * 31 + j * 17) % 4096) - 2048).toShort)
        j += 1
      }
      WavAudio(id, buf.array())
    }
  }

  /** REAL pure-JVM WAV (RIFF PCM16 mono) decoder: validates the RIFF/WAVE
    * magic, walks the chunk list (tolerating extra chunks and respecting
    * word alignment — NOT a fixed-44-byte-offset parser), reads the fmt
    * descriptor, then folds the sample payload into mean/peak amplitude.
    * Non-PCM16-mono or malformed payloads are dropped (coerce-to-null
    * rule). Integer sums end-to-end → the features replay exactly in SQL. */
  def decodeWav(media: Dataset[WavAudio]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOneWav(r.id, r.media)))
  }

  // per-row entry point shared with the magic-byte router ([[sniffAndDecode]])
  case class WavFrame(id: Long, frame: Long, n: Long, sum_sq: Long,
                      zero_crossings: Long)

  /** Frame-level audio features over REAL decoded WAV bytes — the first
    * stage of any audio-corpus pipeline (VAD/energy gating, silence
    * trimming): fixed-size sample frames, per frame the exact-integer
    * energy (Σx², int16² sums stay far inside BIGINT) and the
    * zero-crossing count (sign changes between in-frame neighbors — the
    * classic voicing heuristic). sqrt/RMS is deliberately NOT taken here:
    * emit the rational sufficient statistics, let the consumer divide
    * (rule 1 — no float that doesn't have to exist). Row-local decode +
    * flatMap; the last frame may be partial (`n` carries its true size). */
  def wavFrameFeatures(media: Dataset[WavAudio], frameSize: Int): Dataset[WavFrame] = {
    require(frameSize > 1, s"frameSize=$frameSize")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeWavSamples(r.media).toSeq.flatMap { xs =>
        val nFrames = (xs.length + frameSize - 1) / frameSize
        (0 until nFrames).map { f =>
          val lo = f * frameSize
          val hi = math.min(lo + frameSize, xs.length)
          var ss = 0L
          var zc = 0L
          var j = lo
          while (j < hi) {
            val x = xs(j).toLong
            ss += x * x
            if (j > lo) {
              val p = xs(j - 1)
              if ((p < 0 && xs(j) >= 0) || (p >= 0 && xs(j) < 0)) zc += 1
            }
            j += 1
          }
          WavFrame(r.id, f.toLong, (hi - lo).toLong, ss, zc)
        }
      }
    })
  }

  /** The WAV chunk walk of [[decodeOneWav]], returning the raw PCM16
    * samples (same validation and forged-size guards). */
  private[multimodal] def decodeWavSamples(b: Array[Byte]): Option[Array[Short]] = {
    def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def tag(i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmtOk = false
    var dataOff = -1; var dataLen = 0L
    while (i + 8 <= b.length) {
      val id = tag(i); val sz = u32(i + 4)
      if (sz > (b.length - i - 8).toLong) i = b.length // forged size: end walk
      else {
        if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length)
          fmtOk = u16(i + 8) == 1 && u16(i + 10) == 1 && u16(i + 22) == 16
        else if (id == "data") { dataOff = i + 8; dataLen = sz }
        i += 8 + sz.toInt + (sz.toInt & 1)
      }
    }
    if (!fmtOk || dataOff < 0 || dataOff + dataLen > b.length || dataLen < 2) None
    else {
      val n = (dataLen / 2).toInt
      val out = new Array[Short](n)
      var j = 0
      while (j < n) { out(j) = u16(dataOff + j * 2).toShort; j += 1 }
      Some(out)
    }
  }

  private[multimodal] def decodeOneWav(rid: Long, b: Array[Byte]): Option[WavFeatures] = {
        def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        def u32(i: Int): Long =
          (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
            ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
        def tag(i: Int): String =
          new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") None
        else {
          var i = 12
          var rate = -1; var fmtOk = false
          var dataOff = -1; var dataLen = 0L
          while (i + 8 <= b.length) {
            val id = tag(i); val sz = u32(i + 4)
            // a forged 32-bit size (e.g. 0xFFFFFFF8) would go negative
            // under .toInt and stall or reverse the walk — an infinite
            // loop on a malformed row. Any size past the buffer ends the
            // walk; the semantic checks below reject what's missing.
            if (sz > (b.length - i - 8).toLong) i = b.length
            else {
              if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length) {
                fmtOk = u16(i + 8) == 1 && u16(i + 10) == 1 && u16(i + 22) == 16
                rate = u32(i + 12).toInt
              } else if (id == "data") { dataOff = i + 8; dataLen = sz }
              i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
            }
          }
          if (!fmtOk || rate <= 0 || dataOff < 0 ||
              dataOff + dataLen > b.length || dataLen < 2) None
          else {
            val n = dataLen / 2
            var sum = 0L; var peak = 0L
            var p = dataOff
            val end = dataOff + n.toInt * 2
            while (p < end) {
              val s = u16(p).toShort.toLong
              sum += s
              if (math.abs(s) > peak) peak = math.abs(s)
              p += 2
            }
            Some(WavFeatures(rid, rate, n, sum.toDouble / n, peak))
          }
        }
  }

  /** One decoded row of a MIXED-format media column, uniform across
    * kinds: images report (width, height, n_units = pixels), audio
    * (n_units = samples, width/height 0), video (width, height,
    * n_units = frames), opaque payloads (n_units = bytes). `signal` is the
    * kind's natural mean (channel-mean average / mean amplitude / mean
    * byte) — bounded per-kind by the per-codec gates, detection and
    * routing by `mm_sniff`. */
  case class SniffedMedia(id: Long, kind: String, width: Int, height: Int,
                          n_units: Long, signal: Double)

  /** Magic-byte router over EVERY real decoder in the lane — the piece
    * that replaces the historical `decodeFeatures` stand-in: a mixed
    * corpus media column (the real-world shape — crawled corpora never
    * arrive format-sorted) decodes in ONE `mapPartitions` pass, each row
    * dispatched by its container signature to the actual codec
    * (JPEG/PNG/GIF/PPM/BMP/WAV/FLAC/MJPEG-AVI). Unknown signatures fall back
    * to opaque byte statistics rather than dropping — at 100 TB you want
    * the unrecognized residue COUNTED, not silently vanished; a malformed
    * payload of a RECOGNIZED kind still drops (the per-codec
    * coerce-to-null rule). */
  def sniffAndDecode(media: Dataset[MediaRow]): Dataset[SniffedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => sniffOne(r.id, r.media)))
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean =
    b.length >= at + s.length && s.indices.forall(j => b(at + j) == s.charAt(j).toByte)

  private[multimodal] def sniffOne(id: Long, b: Array[Byte]): Option[SniffedMedia] = {
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      Jpeg.decodeOne(id, b).map(f => SniffedMedia(id, "jpeg", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && startsWith(b, 1, "PNG"))
      Png.decodeOne(id, b).map(f => SniffedMedia(id, "png", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (startsWith(b, 0, "GIF8"))
      Gif.decodeOne(id, b).map(f => SniffedMedia(id, "gif", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (startsWith(b, 0, "P6"))
      decodeOnePpm(id, b).map(f => SniffedMedia(id, "ppm", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (startsWith(b, 0, "fLaC"))
      Flac.decodeOne(id, b).map(f => SniffedMedia(id, "flac", 0, 0,
        f.n_samples, f.mean_amp))
    else if (startsWith(b, 0, "RIFF") && startsWith(b, 8, "WAVE"))
      decodeOneWav(id, b).map(f => SniffedMedia(id, "wav", 0, 0,
        f.n_samples, f.mean_amp))
    else if (startsWith(b, 0, "RIFF") && startsWith(b, 8, "WEBP"))
      Webp.decodeOne(id, b).map(f => SniffedMedia(id, "webp", f.width,
        f.height, f.n_chunks.toLong, 0.0))
    else if (Pdf.looksLikePdf(b))
      Pdf.decodeOne(id, b).map(f => SniffedMedia(id, "pdf", f.page_w,
        f.page_h, f.n_pages.toLong, 0.0))
    else if (Ogg.looksLikeOgg(b))
      Ogg.decodeOne(id, b).map(f => SniffedMedia(id, "ogg", 0, 0,
        f.n_packets, f.granule_last.toDouble / f.n_pages))
    else if (Bmp.looksLikeBmp(b))
      Bmp.decodeOne(id, b).map(f => SniffedMedia(id, "bmp", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (Tiff.looksLikeTiff(b))
      Tiff.decodeOne(id, b).map(f => SniffedMedia(id, "tiff", f.width, f.height,
        f.n_pixels, (f.mean_r + f.mean_g + f.mean_b) / 3.0))
    else if (H264Meta.looksLikeH264(b))
      H264Meta.decodeOne(id, b).map(f => SniffedMedia(id, "h264", f.width,
        f.height, f.n_nal, 0.0))
    else if (Mp4Meta.looksLikeMp4(b))
      Mp4Meta.decodeOne(id, b).map(f => SniffedMedia(id, "mp4", f.width,
        f.height, f.n_boxes, 0.0))
    else if (startsWith(b, 0, "RIFF") && startsWith(b, 8, "AVI ")) {
      val frames = Video.decodeOneAvi(id, b)
      if (frames.isEmpty) None
      else Some(SniffedMedia(id, "avi", frames.head.width, frames.head.height,
        frames.length.toLong,
        frames.map(f => (f.mean_r + f.mean_g + f.mean_b) / 3.0).sum / frames.length))
    } else if (Zip.looksLikeZip(b))
      Zip.decodeOne(id, b).map(f => SniffedMedia(id, "zip", 0, 0,
        f.n_members, f.total_bytes.toDouble / math.max(1L, f.n_members)))
    else if (TarShard.looksLikeTar(b))
      TarShard.decodeOne(id, b).map(f => SniffedMedia(id, "tar", 0, 0,
        f.n_members, f.total_bytes.toDouble / math.max(1L, f.n_members)))
    else if (Ico.looksLikeIco(b)) {
      val entries = Ico.decodeOne(id, b)
      if (entries.isEmpty) None
      else Some(SniffedMedia(id, "ico", entries.head.width,
        entries.head.height, entries.length.toLong,
        entries.map(f => (f.mean_r + f.mean_g + f.mean_b) / 3.0).sum
          / entries.length))
    }
    else if (Mp3Meta.looksLikeMp3(b))
      Mp3Meta.decodeOne(id, b).map(f => SniffedMedia(id, "mp3", 0, 0,
        f.n_frames, f.sum_kbps.toDouble / f.n_frames))
    else if (Mkv.looksLikeMkv(b))
      Mkv.decodeOne(id, b).map(f => SniffedMedia(id, "mkv", f.width,
        f.height, f.n_elements, 0.0))
    else if (Ttf.looksLikeTtf(b))
      Ttf.decodeOne(id, b).map(f => SniffedMedia(id, "ttf", f.units_per_em,
        0, f.n_glyphs.toLong, 0.0))
    else {
      // opaque fallback: counted, not vanished
      var sum = 0L; var i = 0
      while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
      Some(SniffedMedia(id, "opaque", 0, 0, b.length.toLong,
        if (b.length == 0) 0.0 else sum.toDouble / b.length))
    }
  }

  /** Byte-stats lane (fingerprint + mean byte) — the pre-r8 stand-in,
    * kept as the opaque-payload feature extractor and the plumbing spec's
    * fixture. Real container decode lives in [[sniffAndDecode]]. */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "decoder" init would go here (native lib handle)
      rows.map { r =>
        val bytes = r.media
        var fp = 0L
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          fp = (fp * 31 + (bytes(i) & 0xff)) % 1000000007L
          sum += (bytes(i) & 0xff)
          i += 1
        }
        val brightness = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
        MediaFeatures(r.id, bytes.length, r.format, fp, brightness)
      }
    }
  }
}
