package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-relevance scoring for training-data pipelines: TF-IDF term
  * extraction, BM25 document scoring, corpus n-gram frequency top-k.
  *
  * Cross-engine determinism stance (see CLAUDE.md / the float-determinism
  * notes): no `log`/`ln` in oracle-compared scores (JVM `Math.log` and libm
  * disagree by 1 ulp) — IDF uses the rational Robertson–Sparck Jones form
  * `(N − df + ½)/(df + ½) + 1` (the BM25 idf argument without the ln) on
  * both sides; raw per-row double products/quotients are bit-identical
  * across engines, so scores are exact without any rounding. Constants
  * appear as the same arithmetic (`1.2 + 1.0`, never a pre-folded `2.2`)
  * in the Scala plan and the oracle SQL so both engines fold the identical
  * double ops.
  *
  * Scale posture: TF and DF are plain groupBy aggregations (map-side
  * partial combine); the tf⟗df join shuffles on `term` (vocabulary-sized,
  * not corpus-sized; AQE handles skewed stop-terms); BM25's corpus stats
  * collapse to ONE single-row aggregate that is broadcast — nothing
  * corpus-sized ever sits on a build side. Top-k terms per doc is a
  * per-doc window (one shuffle on doc_id); corpus top-k is
  * TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  * no global sort).
  */
object Relevance {

  /** Per-doc top-k terms by TF-IDF.
    *
    * tfidf = tf · (N / df) — the log-free rational IDF (monotone in the
    * classic ln(N/df) for fixed tf, so top-k sets match common practice on
    * everything except near-tie order). Ties rank by term ascending so the
    * result is engine-independent.
    *
    * Returns (doc_id, term, tf, df, tfidf, rank).
    */
  def tfIdfTopTerms(docs: DataFrame, id: String, text: String, k: Int): DataFrame = {
    // N as a single-row broadcast aggregate INSIDE the plan (the bm25
    // corpus-stats pattern) — no driver-side count() job, and at 100 TB no
    // separate full pass over the corpus just to learn a scalar. The
    // aggregate scans zero columns (count over an empty projection), so it
    // is the cheapest possible pass and runs as part of the one query.
    val nStats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val terms = docs.select(col(id).as("doc_id"),
        TextFns.words(col(text)).as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("term"))
    // localCheckpoint: tf feeds BOTH the score join and the df derivation —
    // without the barrier Catalyst re-runs the corpus scan + explode + agg
    // for each consumer (two full passes over the heaviest input; observed
    // as two parquet scans in the plan). The materialized tf is the
    // post-aggregation (doc, term) relation — already shuffle-sized.
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // df from tf (already one row per (doc, term)) — no second pass over
    // the exploded words
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nStats))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs") / col("df").cast("double")))
      .drop("n_docs")
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rank")
  }

  /** BM25 score of every document against a fixed query-term set.
    *
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    * the rational idf (see object doc). Terms are summed in the given
    * order (left-assoc adds — replayable).
    *
    * Returns (doc_id, dl, tf_<term>…, bm25).
    */
  def bm25(docs: DataFrame, id: String, text: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = col(text)
    // localCheckpoint: base feeds the corpus-stats aggregate AND the scored
    // output — the barrier keeps the text column read + tokenization to ONE
    // scan, and the materialized base is narrow (id + a few ints; the text
    // itself is dropped here).
    val base = docs.select(
      col(id).as("doc_id") +:
        TextFns.wordCount(t).cast("long").as("dl") +:
        terms.map(tm => TextFns.countWord(t, tm).cast("long").as(s"tf_$tm")): _*)
      .localCheckpoint()
    // ONE single-row corpus-stats aggregate (N, Σdl, per-term df) —
    // integer sums, exact; broadcast to every row
    val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      terms.map(tm => sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def component(tm: String): Column = {
      val tf = col(s"tf_$tm").cast("double")
      val dfc = col(s"df_$tm").cast("double")
      val idf = (col("n").cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0)
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }
    base.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl") +:
        terms.map(tm => col(s"tf_$tm")) :+
        terms.map(component).reduce(_ + _).as("bm25"): _*)
  }

  /** BM25 retrieval: rank the corpus against a SET of queries and keep
    * the top `k` docs per query — the batch search-evaluation shape
    * (building retrieval training pairs, nearest-neighbor text baselines).
    *
    * One corpus scan covers every query: per-doc term frequencies are
    * computed for the UNION of all query terms (row-local), the single-row
    * corpus stats broadcast, and each query's score column is [[bm25]]'s
    * exact IEEE tree over its own terms. Per-query top-k plans as
    * TakeOrderedAndProject under the (score DESC, doc_id ASC) total order
    * — never a global sort — and the rank window runs on the tiny
    * (queries × k) union. Ties on identical scores are doc_id-stable, so
    * the cut replays exactly. */
  def searchTopK(docs: DataFrame, id: String, text: String,
                 queries: Seq[(String, Seq[String])], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val t = col(text)
    val allTerms = queries.flatMap(_._2).distinct
    val base = docs.select(
      col(id).as("doc_id") +:
        TextFns.wordCount(t).cast("long").as("dl") +:
        allTerms.map(tm => TextFns.countWord(t, tm).cast("long").as(s"tf_$tm")): _*)
      .localCheckpoint()
    val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      allTerms.map(tm => sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    def component(tm: String): Column = {
      val tf = col(s"tf_$tm").cast("double")
      val dfc = col(s"df_$tm").cast("double")
      val idf = (col("n").cast("double") - dfc + lit(0.5)) / (dfc + lit(0.5)) + lit(1.0)
      idf * (tf * (lit(k1) + lit(1.0))) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }
    val scored = base.crossJoin(broadcast(stats))
    val tops = queries.map { case (qid, terms) =>
      scored.select(lit(qid).as("query_id"), col("doc_id"),
          terms.map(component).reduce(_ + _).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(k)
    }.reduce(_ unionByName _)
    tops.withColumn("rank", row_number().over(
      Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id").asc)))
  }

  /** Corpus-wide top-k word n-grams by occurrence count (duplicates within
    * a doc count). Total order (cnt desc, ngram asc) makes the cut and the
    * rank engine-independent.
    *
    * Returns (ngram, cnt, rank).
    */
  def ngramTopK(docs: DataFrame, text: String, n: Int, k: Int): DataFrame = {
    // word array materialized in its own Project before the n-gram
    // transform indexes into it (CLAUDE.md rule 3)
    val withWords = docs.select(TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    val grams = withWords.filter(size(ws) >= n)
      // explode_outer, not explode — see Dedup.wordShingles: a plain
      // explode gets a size(grams)>0 infer-filter that re-inlines the
      // whole transform
      .select(explode_outer(
        graft.functions.CorpusKernels.ngramJoin(ws, n)).as("ngram"))
    val counts = grams.groupBy("ngram").agg(count(lit(1)).as("cnt"))
    // The partition-less window here triggers a `WindowExec: No Partition
    // Defined` WARN — deliberately benign: it runs AFTER limit(k), over at
    // most k (~20) rows, so the single-partition move is bounded by k, not
    // the corpus. (TakeOrderedAndProject does the distributed heavy lift.)
    counts.orderBy(col("cnt").desc, col("ngram").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("ngram").asc)).cast("long"))
  }

  /** Top-k bigram collocations by pointwise mutual information — the
    * phrase-mining pass that decides "new york" is a unit and "of the" is
    * noise. PMI is kept in its RATIONAL form (the text_tfidf log-free
    * trick): with P(ab)=n_pair/N_bi and P(w)=c_w/N_uni,
    * ratio = n_pair·N_uni² / (N_bi·c_a·c_b) ranks identically to
    * log-PMI (log is monotone) while both sides of the oracle compute
    * the SAME two exact-integer products and ONE IEEE division — no
    * cross-engine ln drift. `minCount` is the standard support floor
    * (PMI of a hapax pair is pure noise and tops every list).
    *
    * Scale: two corpus passes (unigram + bigram counts, each one
    * map-side-combined groupBy), two hash joins of pair counts against
    * the vocab frame, totals as tiny in-plan aggregates (no eager
    * count) — then TakeOrderedAndProject for the global top-k.
    * Returns (bigram, n_pair, pmi_ratio, rank). The exact DECIMAL(38,0)
    * products stay INTERNAL: a decimal-family column in a gate's OUTPUT
    * schema diverges under the driver's cross-engine hash
    * canonicalization (the r13 red-gate / r10 graph_pagerank HUGEINT
    * lesson — decimals feed the division, never the dump).
    */
  def collocations(docs: DataFrame, text: String, minCount: Long,
                   k: Int): DataFrame = {
    val withWords = docs.select(TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    val uni = withWords.filter(size(ws) >= 1)
      .select(explode_outer(ws).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val bi = withWords.filter(size(ws) >= 2)
      .select(explode_outer(transform(sequence(lit(0), size(ws) - 2),
        i => struct(element_at(ws, i + 1).as("wa"),
          element_at(ws, i + 2).as("wb")))).as("p"))
      .select(col("p.wa"), col("p.wb"))
      .groupBy("wa", "wb").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val nUni = uni.agg(sum(col("c1")).as("n_uni"))
    val nBi = withWords.agg(
      sum(greatest(size(ws) - 1, lit(0))).cast("long").as("n_bi"))
    val scored = bi
      .join(uni.select(col("w").as("wa"), col("c1").as("c_a")), "wa")
      .join(uni.select(col("w").as("wb"), col("c1").as("c_b")), "wb")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(concat_ws(" ", col("wa"), col("wb")).as("bigram"),
        col("n_pair"),
        // DECIMAL(38,0) products: N_uni² alone overflows Long past ~3e9
        // total corpus words — far under the 100 TB posture. Decimal keeps
        // the two products exact (the ksTest cross-multiply precedent);
        // the single IEEE division below is unchanged.
        (col("n_pair").cast("decimal(38,0)") * col("n_uni") * col("n_uni"))
          .cast("decimal(38,0)").as("num"),
        (col("n_bi").cast("decimal(38,0)") * col("c_a") * col("c_b"))
          .cast("decimal(38,0)").as("den"))
      .withColumn("pmi_ratio",
        col("num").cast("double") / col("den").cast("double"))
    scored.orderBy(col("pmi_ratio").desc, col("bigram").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi_ratio").desc, col("bigram").asc)).cast("long"))
      .select(col("bigram"), col("n_pair"), col("pmi_ratio"), col("rank"))
  }

  /** Hashed-feature linear classifier INFERENCE (the fastText-style
    * quality-classifier serving shape every corpus pipeline runs): each
    * word hashes into one of `dims` buckets (the hashing trick — no vocab
    * table, O(1) memory at any corpus size), the doc score is the fold-sum
    * of per-bucket weights over word OCCURRENCES plus a bias, and the
    * verdict is `score > 0`. Entirely ROW-LOCAL — one projection, zero
    * shuffles, codegen-friendly higher-order fold; at 100 TB this is a
    * pure map over the corpus, exactly how a learned quality gate deploys.
    *
    * Weights here are a deterministic function of the bucket
    * (`bucket % 7 − 3`, integers, engine-replayable — the md5 convention
    * of [[graft.ann.Quant.randomProject]]); a TRAINED model drops in as a
    * broadcast bucket→weight map without touching the plan shape. Integer
    * arithmetic end to end, so the gate hash-compares exactly. */
  def hashedLinearScore(docs: DataFrame, id: String, text: String,
                        dims: Int = 64, bias: Long = 1L): DataFrame = {
    def bucket(w: Column): Column =
      pmod(conv(substring(md5(w), 1, 15), 16, 10).cast("long"), lit(dims.toLong))
    def weight(w: Column): Column = bucket(w) % 7 - 3
    docs.select(col(id),
        (aggregate(TextFns.words(col(text)), lit(0L), (acc, w) => acc + weight(w))
          + bias).as("score"))
      .withColumn("positive", col("score") > 0)
  }
}
