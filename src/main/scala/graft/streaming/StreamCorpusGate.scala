package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Streaming corpus-ingest gate — the §2.9 counterpart of the batch
  * `corpus_gate` query: documents flow through bounded-state content dedup
  * and row-local quality scoring AS THEY ARRIVE, so junk and re-deliveries
  * never reach storage or the (much more expensive) batch dedup passes.
  *
  * Everything after the dedup stage is a narrow map — token counting,
  * language ID, repetition ratios are pure column expressions over the
  * row's own text (the same signals the batch gate uses; the corpus-wide
  * signals — MinHash, decontam — are inherently batch and stay in the
  * batch layer, the standard lambda split documented in [[StreamDedup]]).
  * State is therefore exactly the dedup stage's watermark-bounded hash
  * set: the pipeline runs in append mode on an unbounded stream.
  *
  * Emits every surviving doc with its signals plus the boolean `keep`
  * verdict, so a downstream sink can route kept/rejected separately
  * (foreachBatch or a partition column) without re-scoring.
  */
object StreamCorpusGate {

  /** Per-doc quality columns (row-local, streaming-safe). */
  private def dupWordFrac(ws: Column): Column =
    when(size(ws) > 0,
      (size(ws) - size(array_distinct(ws))).cast("double") / size(ws))
      .otherwise(lit(0.0))

  def gate(docs: DataFrame, text: String, tsCol: String,
           minTokens: Long = 5, maxDupWordFrac: Double = 0.5,
           lateness: String = "10 minutes"): DataFrame = {
    val deduped = StreamDedup.dropRedelivered(docs, text, tsCol, lateness)
    // materialize the word array once in its own Project (CLAUDE.md rule
    // 3) before the signal expressions index into it
    val withWords = deduped.withColumn("ws", TextFns.words(col(text)))
    withWords
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("lang_guess", TextFns.langIdFromWords(col("ws")))
      .withColumn("dup_word_frac", dupWordFrac(col("ws")))
      .drop("ws")
      .withColumn("keep",
        col("n_tokens") >= minTokens &&
          col("dup_word_frac") <= maxDupWordFrac &&
          col("lang_guess").isNotNull)
  }
}
