package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-fit n-gram language-model scoring — the CCNet-style "how typical
  * of the corpus is this document" quality signal (CCNet scores with a
  * KenLM 5-gram perplexity; the operator shape is identical: fit counts on
  * the corpus, broadcast/join the model, score every doc).
  *
  * Log-free deterministic formulation: instead of perplexity
  * exp(−1/n·Σ ln p) the score is the MEAN CONDITIONAL PROBABILITY
  * 1/n · Σ p(wᵢ | wᵢ₋₁) with p = c(wᵢ₋₁wᵢ)/c_head(wᵢ₋₁). `ln` differs by
  * 1 ulp between JVM and libm (the TF-IDF/BM25 lesson — see Relevance),
  * while each p here is ONE IEEE division of two exact integers and the
  * document sum is a SEQUENTIAL fold in token order — bit-identical across
  * engines, so the gate query gets a real hash-exact oracle. The score is
  * monotone-comparable for ranking/filtering just like perplexity (higher
  * = more in-distribution).
  *
  * Plan shape, sized for a 100 TB corpus:
  *  - bigram extraction is row-local (one Project + one generator);
  *  - the model is two groupBy aggregations: (w1,w2) counts, then head
  *    counts derived from the ALREADY-AGGREGATED model (vocabulary²-sized,
  *    never a second pass over the corpus); `localCheckpoint` keeps the
  *    model's corpus scan from re-running for each consumer;
  *  - head counts fold back into the model with a vocabulary-sized join,
  *    so the corpus pays exactly ONE shuffle join, on (w1,w2), against the
  *    compact probability table (AQE broadcasts it when it fits);
  *  - per-doc reduction is one groupBy(doc_id) with partial aggregation.
  */
object LangModel {

  /** Score `docs` by mean conditional bigram probability under a model fit
    * on `modelCorpus` (pass the same frame for self-scoring). Docs with
    * fewer than 2 tokens have no bigrams and are absent from the output.
    * Bigrams unseen in the model corpus drop their rows before the per-doc
    * reduction (self-scoring never hits this; cross-corpus callers see the
    * coverage in `n_bigrams` vs their own token counts).
    *
    * CROSS-CORPUS CAVEAT (default `penalizeUnseen = false`): because
    * unseen bigrams leave both the numerator AND the denominator, a mostly
    * out-of-vocabulary doc with one high-probability covered bigram can
    * outscore a fully in-distribution doc. Don't use the raw score as a
    * quality filter across corpora — either gate on coverage (`n_bigrams`
    * vs the doc's own token count − 1) or set `penalizeUnseen = true`,
    * which divides by the doc's TOTAL bigram count instead (unseen mass
    * counts as probability 0, the CCNet-perplexity-like stance).
    *
    * Returns (doc_id, n_bigrams, lm_score); `n_bigrams` is always the
    * covered count, so coverage stays observable under either mode.
    */
  def bigramScore(docs: DataFrame, modelCorpus: DataFrame,
                  id: String, text: String,
                  penalizeUnseen: Boolean = false): DataFrame = {
    // SELF-SCORING fast path (optimization r19): the self-score gates pass
    // the SAME frame instance for docs and model (`bigramScore(d, d, …)`),
    // and the doc-side and model-side bigram derivations are then the
    // identical frame — materialize it once instead of re-running the
    // corpus scan + bigram explode for the model aggregation. Reference
    // equality is deliberate: two distinct-but-equal frames (cross-corpus
    // mode) keep their own derivations.
    val selfScore = docs eq modelCorpus
    val bigrams =
      if (selfScore) bigramsOf(docs, id, text).localCheckpoint()
      else bigramsOf(docs, id, text)
    // model: c(w1,w2) then c_head(w1) = Σ_w2 c(w1,w2), both off the same
    // aggregated (vocab²-sized) frame — the corpus is scanned once
    val model = (if (selfScore) bigrams else bigramsOf(modelCorpus, id, text))
      .groupBy("w1", "w2").agg(count(lit(1)).as("bg_cnt"))
      .localCheckpoint()
    val heads = model.groupBy("w1").agg(sum("bg_cnt").as("head_cnt"))
    val probModel = model.join(heads, "w1")
      .select(col("w1"), col("w2"),
        (col("bg_cnt").cast("double") / col("head_cnt").cast("double")).as("p"))
    // the single corpus-sized shuffle: doc bigrams ⋈ probability table
    bigrams.join(probModel, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // n_total is constant per doc — min() just carries it through
        min(col("n_total")).as("n_total"),
        // sequential fold in position order — float-sum determinism rule
        aggregate(array_sort(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (a, x) => a + x.getField("p")).as("sum_p"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_p") / (if (penalizeUnseen) col("n_total") else col("n_bigrams"))
          .cast("double")).as("lm_score"))
  }

  /** (doc_id, pos, w1, w2) bigram rows; row-local, no shuffle. The word
    * array is materialized in its own Project before the transform indexes
    * into it (CLAUDE.md rule 3), and the generator is `posexplode_outer`
    * (a plain explode gets a size>0 infer-filter that re-inlines the whole
    * transform — see Dedup.wordShingles). */
  private def bigramsOf(docs: DataFrame, id: String, text: String): DataFrame = {
    val withWords = docs.select(col(id).as("doc_id"), TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    withWords.filter(size(ws) >= 2)
      .select(col("doc_id"), (size(ws) - 1).cast("long").as("n_total"),
        posexplode_outer(transform(
          sequence(lit(0), size(ws) - 2),
          i => struct(element_at(ws, i + 1).as("w1"), element_at(ws, i + 2).as("w2"))))
          .as(Seq("pos", "bg")))
      .select(col("doc_id"), col("n_total"), col("pos").cast("long").as("pos"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }
}
