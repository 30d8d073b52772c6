package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._

/** Hadoop `CompressionCodec` bridge over zstd-jni — the zstd shard codec
  * for text-based sources (JSONL corpus interchange).
  *
  * Why it exists: Hadoop's own `ZStandardCodec` requires the NATIVE hadoop
  * zstd library, which generic deployments (and this sandbox) lack — Spark
  * rejects `compression=zstd` for json/csv/text with CODEC_NOT_AVAILABLE.
  * But zstd-jni ships ON Spark's classpath (parquet/shuffle use it), so
  * this codec adapts its streaming API to the Hadoop interface and the
  * whole text lane gets zstd for free: Spark accepts a fully-qualified
  * codec class name in the `compression` option, and the read side resolves
  * `.zst` files through `io.compression.codecs` (see [[CorpusIO.ensureZstd]]).
  *
  * Scale posture: NOT splittable (like gzip shards) — one task per shard,
  * which is the JSONL-corpus contract anyway (shards are written
  * partition-sized). `getDefaultExtension` is `.zst`, matching Hadoop's
  * native codec and the zstd CLI, so shards interoperate both ways.
  *
  * Pooled [[Compressor]]/[[Decompressor]] instances are DUMMIES (the
  * pre-native `BZip2Codec` precedent): the streams are self-contained
  * (zstd-jni manages its native context per stream), but the
  * `CompressionCodec` contract implies non-null pooled types — consumers
  * like SequenceFile writers call `CodecPool.getCompressor(codec)` and
  * pass the instance back to `createOutputStream`, and a null type NPEs
  * inside `CodecPool`. The dummies satisfy every pool lifecycle call
  * (reset/end/reinit are no-ops) and throw only if something tries to
  * drive the raw block API, which this stream-only codec never wires up.
  */
final class ZstdShardCodec extends CompressionCodec with Configurable {

  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  /** Compression level 3 — zstd's default; the corpus-shard sweet spot
    * (≈gzip-9 ratio at several× the speed). */
  private val level = 3

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZstdShardCodec.ZstdOut(out, level)

  override def createOutputStream(out: OutputStream,
                                  c: Compressor): CompressionOutputStream =
    createOutputStream(out) // streams are self-contained; pooled state unused

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZstdShardCodec.ZstdIn(in)

  override def createInputStream(in: InputStream,
                                 d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZstdShardCodec.DummyCompressor]
  override def createCompressor(): Compressor =
    new ZstdShardCodec.DummyCompressor
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZstdShardCodec.DummyDecompressor]
  override def createDecompressor(): Decompressor =
    new ZstdShardCodec.DummyDecompressor

  override def getDefaultExtension: String = ".zst"
}

object ZstdShardCodec {

  private def streamOnly = throw new UnsupportedOperationException(
    "ZstdShardCodec is stream-only; the pooled block API is a lifecycle dummy")

  /** Pool-lifecycle-safe dummy (BZip2DummyCompressor precedent): CodecPool
    * may construct, reset, and return it; any data call throws. */
  final class DummyCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = streamOnly
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = streamOnly
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int = streamOnly
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  /** Decompressor twin of [[DummyCompressor]]. */
  final class DummyDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = streamOnly
    override def needsInput(): Boolean = false
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = streamOnly
    override def needsDictionary(): Boolean = false
    override def getRemaining: Int = 0
    override def finished(): Boolean = true
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = streamOnly
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  /** Write side: Spark's `CodecStreams` only ever calls write/close on the
    * returned stream; `finish` ends the zstd frame without closing the
    * underlying file for any direct Hadoop OutputFormat user. */
  private final class ZstdOut(raw: OutputStream, level: Int)
      extends CompressionOutputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdOutputStream(raw, level)
    z.setCloseFrameOnFlush(true)
    private var finished = false
    override def write(b: Int): Unit = z.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      z.write(b, off, len)
    override def finish(): Unit = if (!finished) { finished = true; z.flush() }
    override def resetState(): Unit = ()
    override def close(): Unit = z.close() // closes the zstd frame AND raw
  }

  /** Read side: `LineRecordReader` wraps this in a line reader and tracks
    * progress on the RAW seekable stream, so no Seekable impl is needed
    * (the gzip-shard precedent). */
  private final class ZstdIn(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val z = new com.github.luben.zstd.ZstdInputStream(raw)
    // a shard is one frame stream; frames written by any zstd tool
    // concatenate transparently (ZstdInputStream is multi-frame by default)
    override def read(): Int = z.read()
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      z.read(b, off, len)
    override def resetState(): Unit = ()
    override def close(): Unit = { z.close(); super.close() }
  }
}
