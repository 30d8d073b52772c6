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
      .select(col("doc_id"), array_distinct(
        graft.functions.CorpusKernels.ngramJoin(ws, n)).as("grams"))
  }

  /** Bloom-filter decontamination — the scale lane of [[ngramOverlap]].
    *
    * [[ngramOverlap]] broadcasts the RAW bench gram strings; fine while the
    * eval set is thousands of docs, but a big held-out suite (every bench
    * plus their paraphrase sets) can reach 10⁸+ distinct grams — too wide
    * to broadcast as strings. This lane broadcasts `mBits` BITS instead:
    * each bench gram sets `kHashes` positions (Kirsch–Mitzenmacher double
    * hashing, same [[graft.dedup.Dedup.HashFamily]] lanes as minhash);
    * packed into 64-bit words the filter is mBits/8 bytes — 2³⁰ bits =
    * 128 MB covers ~10⁸ grams at 1% FP, still broadcastable.
    *
    * Probe cost per corpus gram: `kHashes` broadcast-hash joins on the
    * word index (map-side, no shuffle) + row-local mask tests; the only
    * corpus shuffle stays the final groupBy(doc_id). One-sided error:
    * never misses a contaminated gram (spec-asserted superset of
    * [[ngramOverlap]]); `flag_frac` can over-count by the FP rate, which
    * is the right direction for a drop-list.
    *
    * Returns (doc_id, n_grams, n_flagged, flag_frac); `family = Md5Hash`
    * makes every bit position SQL-replayable → full DuckDB oracle. */
  def bloomDecontam(corpus: DataFrame, bench: DataFrame,
                    id: String, text: String, n: Int,
                    mBits: Int = 1 << 20, kHashes: Int = 3,
                    family: graft.dedup.Dedup.HashFamily = graft.dedup.Dedup.XxHash): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits=$mBits must be a multiple of 64")
    def posOf(i: Int): org.apache.spark.sql.Column =
      pmod(family.lane(i, col("p")), lit(mBits.toLong))
    // build: distinct bench grams → k positions each → bit_or-packed words
    val benchG = distinctGrams(bench, id, text, n)
      .select(explode_outer(col("grams")).as("shingle")).distinct()
      .select(family.prep(col("shingle")).as("p"))
    val bits = benchG
      .select(explode(array((0 until kHashes).map(posOf): _*)).as("pos"))
      .select(expr("pos DIV 64").as("idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy("idx").agg(expr("bit_or(mask)").as("bits"))
      // consumed by kHashes broadcast joins — materialize the (tiny) word
      // table once instead of re-deriving the bench scan per lane
      .localCheckpoint()
    // probe: k broadcast joins on the word index, then row-local mask tests
    // — a gram's verdict never leaves its row until the one doc_id shuffle
    var g = distinctGrams(corpus, id, text, n)
      .select(col("doc_id"), explode_outer(col("grams")).as("shingle"))
      .select(col("doc_id"), family.prep(col("shingle")).as("p"))
    for (i <- 0 until kHashes)
      g = g.withColumn(s"pos_$i", posOf(i))
        .withColumn(s"idx_$i", expr(s"pos_$i DIV 64"))
        .join(broadcast(bits.select(col("idx").as(s"idx_$i"),
          col("bits").as(s"bits_$i"))), Seq(s"idx_$i"), "left")
    val hit = (0 until kHashes).map { i =>
      val mask = expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos_$i % 64 AS INT))")
      coalesce(col(s"bits_$i"), lit(0L)).bitwiseAND(mask) === mask
    }.reduce(_ && _)
    g.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(hit, 1L).otherwise(0L)).as("n_flagged"))
      .withColumn("flag_frac",
        col("n_flagged").cast("double") / col("n_grams"))
  }

  /** Decontamination by EXCISION — remove the contaminated spans instead
    * of dropping whole documents (the higher-retention variant of
    * [[ngramOverlap]]'s verdict: a doc that merely QUOTES an eval item
    * keeps its unique prose). A corpus token survives iff no n-span
    * covering it appears in the bench set. Bench spans broadcast (eval
    * sets are small); the corpus pass is per-doc local: indexed span
    * probe + indexed token filter, the same rebuild shape as
    * `Dedup.stripDupSpans`. Returns (doc_id, n_tokens, n_kept,
    * cleaned_hash). */
  def stripBenchSpans(corpus: DataFrame, bench: DataFrame,
                      id: String, text: String, n: Int): DataFrame = {
    val benchG = distinctGrams(bench, id, text, n)
      .select(explode_outer(col("grams")).as("span")).distinct()
    val withWords = corpus.select(col(id).as("doc_id"),
      graft.functions.TextFns.words(col(text)).as("ws"))
    val ws = col("ws")
    val spans = graft.functions.CorpusKernels.ngramJoin(ws, n)
    val posSpans = withWords.filter(size(ws) >= n)
      .select(col("doc_id"), posexplode_outer(spans).as(Seq("pos", "span")))
    val dirty = posSpans.join(broadcast(benchG), Seq("span"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    withWords.join(dirty, Seq("doc_id"), "left")
      .select(col("doc_id"), ws,
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col("doc_id"),
        size(ws).cast("long").as("n_tokens"),
        filter(ws, (t, i) =>
          !exists(col("starts"), s => i >= s && i <= s + (n - 1))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("kept"))).as("cleaned_hash"))
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

  /** Semantic decontamination — the EMBEDDING-space member of the family
    * (next to the n-gram and Bloom lanes): flag every corpus item whose
    * embedding reaches `threshold` cosine against ANY benchmark item.
    * Paraphrased eval leakage shares no n-grams but sits next to the bench
    * item in embedding space, which is why modern pipelines run both
    * passes. A bench item present verbatim in the corpus self-matches at
    * cosine 1 — flagged, as decontamination requires.
    *
    * Plan shape at 100 TB: the bench side is broadcast (eval sets are
    * small by definition), the corpus streams through one codegen'd
    * cosine pass ([[graft.functions.VecDotFloat]] via [[Ann.cosine]]),
    * and the only shuffle is the per-item max — partial-aggregated
    * map-side. Determinism: each cosine is an exact sequential fold,
    * `round(·, 6)` is monotone so MAX commutes with it, and max itself is
    * order-free — the verdict replays exactly in SQL.
    *
    * Returns (vec_id, max_cos, contaminated). */
  def semanticDecontam(corpus: DataFrame, bench: DataFrame,
                       id: String, vec: String,
                       threshold: Double): DataFrame = {
    val b = broadcast(bench.select(col(vec).as("bv")))
    // LEFT join on TRUE, not crossJoin (ADVICE r8): an EMPTY bench must
    // yield every corpus item uncontaminated — a cross join would instead
    // erase the corpus from the verdict. Same BroadcastNestedLoopJoin
    // shape either way; for a non-empty bench the outputs are identical.
    corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
      .join(b, lit(true), "left")
      .select(col("vec_id"),
        round(graft.ann.Ann.cosine(col("cv"), col("bv")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(max(col("cos")).as("max_cos"))
      .select(col("vec_id"), col("max_cos"),
        coalesce(col("max_cos") >= threshold, lit(false)).as("contaminated"))
  }

  /** IVF-blocked semantic decontam — the scale lane for when the BENCH
    * itself is large (a full eval-suite embedding set): cluster the bench
    * into `nLists` cells (value-predicate seeds — deterministic, SQL-
    * replayable), then each corpus row scores only the bench members of
    * its `nProbe` nearest cells. Per-row work drops from |bench| dots to
    * nLists + |bench|·nProbe/nLists — the [[graft.ann.Ann.semanticDedup]]
    * blocking shape applied to decontamination.
    *
    * Approximation contract (same one-sidedness CAVEAT as SemDeDup, in
    * the UNSAFE direction for a drop-list): a contaminated item whose
    * best bench match lives outside its probed cells is missed, so probe
    * generously — `nProbe = nLists` recovers the exact lane bit-for-bit
    * (spec-asserted). Plan: centroids and bench cells broadcast; the
    * corpus shuffles once on `vec_id` (probe-rank window), and the final
    * per-item max reuses that partitioning — no second corpus exchange.
    *
    * Every cell contains at least its seed (a bench item is its own
    * nearest centroid at cosine 1), so probed joins never drop a corpus
    * row; an EMPTY bench yields every row uncontaminated (exact-lane
    * semantics, via the one-row driver check on the broadcast-sized
    * centroid frame). */
  def semanticDecontamBlocked(corpus: DataFrame, bench: DataFrame,
                              id: String, vec: String, threshold: Double,
                              nLists: Int = 4, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ann.Ann
    val centroids = Ann.ivfCentroids(bench, id, vec, nLists).localCheckpoint()
    if (centroids.isEmpty) {
      return corpus.select(col(id).as("vec_id"),
        lit(null).cast("double").as("max_cos"), lit(false).as("contaminated"))
    }
    val bcells = Ann.assignCells(bench, id, vec, centroids)
      .join(bench.select(col(id).as("cid"), col(vec).as("bv")), "cid")
      .select(col("centroid_id"), col("bv"))
    // probe ranking carries the corpus vector along (re-deriving probeCells
    // + a join back on vec_id would shuffle the corpus twice)
    val probed = corpus.select(col(id).as("vec_id"), col(vec).as("cv"))
      .crossJoin(broadcast(centroids))
      .withColumn("d", -Ann.cosine(col("cv"), col("centroid")))
      .withColumn("pr", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d").asc, col("centroid_id").asc)))
      .filter(col("pr") <= nProbe)
      .select(col("vec_id"), col("cv"), col("centroid_id"))
    probed.join(broadcast(bcells), "centroid_id")
      .select(col("vec_id"),
        round(Ann.cosine(col("cv"), col("bv")), 6).as("cos"))
      .groupBy("vec_id")
      .agg(max(col("cos")).as("max_cos"))
      .select(col("vec_id"), col("max_cos"),
        (col("max_cos") >= threshold).as("contaminated"))
  }
}
