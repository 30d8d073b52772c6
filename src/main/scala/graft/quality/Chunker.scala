package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Token-window document chunking — split long documents into fixed-size
  * token windows with overlap (the standard pre-tokenization step before
  * packing sequences to a context length).
  *
  * Chunk starts are the arithmetic progression 0, step, 2·step, … < n_words
  * with step = chunkSize − overlap, so consecutive chunks share `overlap`
  * tokens and every token belongs to at least one chunk. All arithmetic is
  * integer and the chunk text is a pure slice — exactly replayable in SQL
  * (list slicing + array_to_string).
  *
  * Scale posture: one Project + one generator (posexplode) per document —
  * no shuffle at all; chunking is embarrassingly row-parallel. Output rows
  * ≈ input tokens / step; downstream repartitioning (e.g. by chunk hash
  * for dedup) is the consumer's choice.
  */
object Chunker {

  def chunkByTokens(docs: DataFrame, id: String, text: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got ($chunkSize, $overlap)")
    val step = chunkSize - overlap
    // word array materialized in its own Project before slicing (rule 3)
    val withWords = docs.select(col(id).as("doc_id"), TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    withWords.filter(size(ws) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(ws) - 1, lit(step)),
          start => slice(ws, start + 1, lit(chunkSize)))).as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }
}
