package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Train/eval decontamination — per-document word n-gram overlap against a
  * benchmark set (the standard "drop training docs that share n-grams with
  * the eval set" pass before a training run).
  *
  * Plan shape, sized for a tiny bench side vs a 100 TB corpus:
  *  - distinct grams per document are computed ROW-LOCALLY
  *    (`array_distinct` over the gram transform) — no corpus-wide
  *    distinct shuffle, unlike the dedup inverted index which needs one;
  *  - the bench gram set (eval sets are small by definition) is distinct'd
  *    on its own tiny frame and BROADCAST, so the corpus side streams
  *    through a map-side hash join;
  *  - the only corpus shuffle is the final groupBy(doc_id), and partial
  *    aggregation collapses each doc to one row before it moves.
  *
  * Returns one row per corpus doc with >= n words: (doc_id, n_grams,
  * n_contaminated, contam_frac). Callers filter `contam_frac > 0` (strict)
  * or a threshold to produce the drop list.
  */
object Decontam {

  /** Distinct word n-grams per doc, as an array column (one Project; the
    * word array is materialized first — Dedup.wordShingles documents the
    * O(words²) re-inlining trap this avoids). */
  private def distinctGrams(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val withWords = df.select(col(id).as("doc_id"), TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    withWords.filter(size(ws) >= n)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))
        .as("grams"))
  }

  def ngramOverlap(corpus: DataFrame, bench: DataFrame,
                   id: String, text: String, n: Int): DataFrame = {
    val corpusG = distinctGrams(corpus, id, text, n)
      .select(col("doc_id"), explode_outer(col("grams")).as("shingle"))
    val benchG = distinctGrams(bench, id, text, n)
      .select(explode_outer(col("grams")).as("shingle"))
      .distinct()
      .withColumn("hit", lit(1L))
    corpusG.join(broadcast(benchG), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contam_frac",
        col("n_contaminated").cast("double") / col("n_grams"))
  }
}
