package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the corpus-pipeline hot paths (optimization r18).
  *
  * Two operators dominated the dedup/tokenizer bench families with
  * INTERPRETED higher-order-function inner loops (`transform`/`aggregate`
  * lambdas are CodegenFallback — every element pays interpreted expression
  * dispatch):
  *
  *  - the Md5-family MinHash signature stage evaluated, per (doc, shingle)
  *    row, a `concat_ws` shingle build + an `md5` + two `conv(substring)`
  *    parses, then shuffled one 17-column row per doc per partition into a
  *    groupBy just to take k mins — when the whole signature is a pure
  *    function of the document's word array;
  *  - the Unigram-LM Viterbi DP ran `aggregate(sequence(1, len), …)` with a
  *    3-candidate `least` per character, each candidate a `substr` + a
  *    LINEAR-scan literal-map lookup.
  *
  * Both kernels follow the [[HierArgMinKernel]] discipline: the heavy loop
  * is a plain JVM method on a reference object, the expression stays
  * whole-stage-codegen-friendly (`doGenCode` emits one call), and
  * BIT-IDENTITY with the expression formulation it replaces is the
  * contract (spec-pinned): identical md5 bytes, identical integer
  * arithmetic, identical tie rules. No results change — only the plan
  * shape (the signature groupBy exchange disappears) and the per-row cost.
  */
object CorpusKernels {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** k Md5-family MinHash lane minima over a word array's n-gram shingles.
    * Exactly `min_i over shingles of (h1 + i*h2)` where
    * `h1 = conv(substring(md5(shingle),1,15),16,10)` and
    * `h2 = conv(substring(md5(shingle),17,15),16,10) % 2^55`
    * (Dedup.Md5Hash's Kirsch–Mitzenmacher lanes), shingle =
    * `concat_ws(" ", words[s..s+n-1])`. Docs with fewer than n words (the
    * caller filters them out, matching `shingleArray`) would return
    * all-MaxValue — never emitted. */
  def minHashMd5(words: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashMd5Sigs(ColumnBridge.expression(words), n, k))

  /** Packed Viterbi DP verdict for ONE word: `cost·1024 + pieces` of the
    * minimum-cost unigram segmentation — exactly
    * `element_at(aggregate(sequence(1, len), [0L], step), len+1)` of
    * `Tokenizer.unigramViterbi`'s fold. */
  def viterbiPack(word: Column, vocab: Seq[(String, Int)], unkCost: Int,
                  maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramViterbiPack(ColumnBridge.expression(word),
      new ViterbiKernel(vocab, unkCost, maxPieceLen)))
}

/** MD5 MinHash signature kernel — see [[CorpusKernels.minHashMd5]].
  * Thread-confined MessageDigest (MD5 instances are not thread-safe);
  * h1/h2 are read NUMERICALLY from the digest bytes (hex chars 0–14 are
  * bytes 0–6 plus the high nibble of byte 7; chars 16–30 are bytes 8–14
  * plus the high nibble of byte 15) — bit-identical to parsing the hex
  * substrings, with no hex string materialized. */
final class MinHashMd5Kernel(n: Int, k: Int) extends Serializable {
  require(n >= 1 && k >= 1, "degenerate minhash parameters")

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val space = Array[Byte](' '.toByte)

  /** 60-bit value of hex chars [c, c+15) of the 16-byte digest, where c is
    * 0 or 16 (so it always starts on a byte boundary and ends mid-byte). */
  @inline private def hex15(d: Array[Byte], byteStart: Int): Long = {
    var v = 0L
    var j = byteStart
    val end = byteStart + 7
    while (j < end) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
    (v << 4) | ((d(end) & 0xffL) >>> 4)
  }

  def apply(ws: ArrayData): ArrayData = {
    val w = ws.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = mdLocal.get()
    var s = 0
    val last = w - n
    while (s <= last) {
      md.reset()
      // concat_ws(" ", …) semantics: null words are SKIPPED (no separator)
      var first = true
      var j = s
      val end = s + n
      while (j < end) {
        if (!ws.isNullAt(j)) {
          if (!first) md.update(space)
          md.update(ws.getUTF8String(j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val h1 = hex15(d, 0)
      val h2 = hex15(d, 8) % (1L << 55)
      var i = 0
      var lane = h1
      while (i < k) {
        if (lane < mins(i)) mins(i) = lane
        lane += h2
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** `array<string>` words → `array<long>` of the k MinHash lane minima.
  * Null input → null. */
case class MinHashMd5Sigs(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  private val kernel = new MinHashMd5Kernel(n, k)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MinHashMd5Sigs requires array<string> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("minHashMd5Kernel", kernel,
      classOf[MinHashMd5Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kRef.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Viterbi DP kernel — see [[CorpusKernels.viterbiPack]]. Vocabulary keys
  * are stored as [[UTF8String]] (byte-level equality and hashing, exactly
  * the semantics of Catalyst's literal-map `element_at`); substrings are
  * taken at CHARACTER (code point) positions via `UTF8String.substring`,
  * exactly `Column.substr`. The DP array is reused across candidates; all
  * arithmetic is the fold's: `acc(i−L) + cost·1024 + 1`, minimized with
  * signed-long comparison (`least`). */
final class ViterbiKernel(vocab: Seq[(String, Int)], unkCost: Int,
                          maxPieceLen: Int) extends Serializable {
  require(maxPieceLen >= 1, "degenerate maxPieceLen")
  require(vocab.forall(_._1.length <= maxPieceLen),
    s"vocab pieces must be <= $maxPieceLen chars")

  // built eagerly (serializable Seq retained; map rebuilt on deserialize)
  @transient private lazy val vmap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    // map_from_arrays keeps the LAST binding for a duplicated key
    vocab.foreach { case (p, c) => m.put(UTF8String.fromString(p), Integer.valueOf(c)) }
    m
  }

  def apply(w: UTF8String): Long = {
    val len = w.numChars()
    if (len == 0) return 0L
    val dp = new Array[Long](len + 1)
    var i = 1
    while (i <= len) {
      var best = Long.MaxValue
      val maxL = if (i < maxPieceLen) i else maxPieceLen
      var L = 1
      while (L <= maxL) {
        val piece = w.substring(i - L, i)
        val c = vmap.get(piece)
        val cost: Long =
          if (c != null) c.longValue()
          else if (L == 1) unkCost.toLong
          else -1L
        if (cost >= 0L) {
          val cand = dp(i - L) + cost * 1024L + 1L
          if (cand < best) best = cand
        }
        L += 1
      }
      dp(i) = best
      i += 1
    }
    dp(len)
  }
}

/** `string` word → packed `long` Viterbi verdict. Null input → null. */
case class UnigramViterbiPack(child: Expression, kernel: ViterbiKernel)
  extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"UnigramViterbiPack requires string input, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("viterbiKernel", kernel,
      classOf[ViterbiKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kRef.apply($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
