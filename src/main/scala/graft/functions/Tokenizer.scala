package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Trained subword tokenizer: corpus-frequency vocabulary + greedy
  * longest-match encoding — the WordPiece-inference shape every LLM data
  * pipeline runs over its corpus before token accounting.
  *
  * Two halves, both Spark-shaped for 100 TB:
  *  - [[trainVocab]] is ONE aggregation: explode every character n-gram
  *    (lengths `minLen..maxLen`), count, keep the global top-`vocabSize`
  *    via TakeOrderedAndProject — a mergeable map-side-combined agg whose
  *    shuffle is bounded by the DISTINCT gram count (charset^maxLen), not
  *    the corpus size. No iterative merge loop touches the corpus (real
  *    BPE training iterates pair-merges; serving-side encoding below is
  *    identical for either vocab source).
  *  - [[encode]] is row-local: the vocab (a few hundred to a few hundred
  *    thousand tokens) broadcasts, and each document walks its text once,
  *    taking the longest vocab hit at each position (single characters are
  *    the implicit fallback alphabet, so encoding never gets stuck). No
  *    shuffle, no state — a mapPartitions lane like the codec decoders.
  *
  * Determinism contract (oracle-replayable): vocab ranking orders by
  * (count DESC, token ASC) — a total order, so the top-K cut is exact; the
  * greedy walk is a pure function of (text, vocab set). Offsets are
  * UTF-16-unit-based on the Spark side, character-based in SQL replay —
  * identical for ASCII/BMP text (the fixtures are printable ASCII).
  */
object Tokenizer {

  /** Top-`vocabSize` character n-grams (lengths `minLen..maxLen`) by
    * corpus frequency → (`token`, `freq`), ordered by the ranking. */
  def trainVocab(docs: DataFrame, textCol: String,
                 minLen: Int = 2, maxLen: Int = 4,
                 vocabSize: Int = 200): DataFrame = {
    require(minLen >= 2, "single characters are the implicit fallback alphabet")
    require(maxLen >= minLen && vocabSize > 0, "degenerate vocab parameters")
    val base = docs.select(col(textCol).as("__t"))
      .withColumn("__len", length(col("__t")))
    val grams = (minLen to maxLen).map { n =>
      // __len >= n guard matters: Spark's sequence(1, 0) DESCENDS ([1,0])
      // instead of returning empty
      base.filter(col("__len") >= n)
        .select(explode(expr(
          s"transform(sequence(1, __len - ${n - 1}), i -> substring(__t, i, $n))"))
          .as("token"))
    }.reduce(_ unionAll _)
    grams.groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(vocabSize)
  }

  /** Greedy longest-match encoding of `textCol` against a broadcast
    * `vocab`: per document, `n_tokens` (total emitted tokens, single-char
    * fallbacks included), `n_multi` (tokens that hit the vocab, length ≥
    * `minLen`), and `first_token` (the first emitted token — "" for empty
    * text). Row-local; composes after [[trainVocab]].collect or any
    * externally-supplied vocabulary. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Seq[String],
             minLen: Int = 2, maxLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    val src: Dataset[(Long, String)] =
      docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
    src.mapPartitions { it =>
      val v = bc.value
      it.map { case (id, text0) =>
        val text = if (text0 == null) "" else text0
        val L = text.length
        var pos = 0; var nTok = 0; var nMulti = 0; var firstTok = ""
        while (pos < L) {
          var m = 1
          var n = math.min(maxLen, L - pos)
          while (n >= minLen && m == 1) {
            if (v.contains(text.substring(pos, pos + n))) m = n
            n -= 1
          }
          if (nTok == 0) firstTok = text.substring(pos, pos + m)
          pos += m; nTok += 1
          if (m > 1) nMulti += 1
        }
        (id, nTok.toLong, nMulti.toLong, firstTok)
      }
    }.toDF(idCol, "n_tokens", "n_multi", "first_token")
  }

  /** Train-then-encode in one call (the gate shape): vocab from the same
    * corpus, collected (vocab-sized — bounded by `vocabSize`) and
    * broadcast into the encode pass. */
  def trainAndEncode(docs: DataFrame, idCol: String, textCol: String,
                     minLen: Int = 2, maxLen: Int = 4,
                     vocabSize: Int = 200): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = trainVocab(docs, textCol, minLen, maxLen, vocabSize)
      .select("token").as[String].collect().toSeq
    encode(docs, idCol, textCol, vocab, minLen, maxLen)
  }
}
