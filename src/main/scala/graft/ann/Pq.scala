package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AggExpressions

/** Product quantization (PQ) for embedding search — the compressed-domain
  * lane of a 100 TB vector corpus. Each vector is split into `m` subvectors;
  * each subspace gets a `ksub`-entry codebook; a vector is stored as m small
  * codes (m bytes at ksub ≤ 256) instead of dims floats — a 32× scan-
  * bandwidth cut at dims=64/m=8, which is what makes an exhaustive scan of a
  * quantized 100 TB corpus feasible. Queries score against codes with an
  * ADC (asymmetric distance computation) table: per (query, subspace, code)
  * dot products, precomputed once per query against the tiny codebook, so
  * scoring a corpus row is m table lookups + a bounded fold — never a
  * dims-length loop.
  *
  * Approximate cosine: score(q, x) = Σ_s dot(q_s, w_{s,code_s})
  * / (|q| · |x̂|) with |x̂| = sqrt(Σ_s |w_{s,code_s}|²) — the exact cosine
  * of q with the RECONSTRUCTED vector x̂, without ever materializing x̂.
  *
  * Determinism stance (same as [[Ann]]): no RNG anywhere — codebook seeds
  * are a value predicate on ids; assignment ties break by code id
  * (hash-aggregable via [[AggExpressions.minByPair]]); every float sum is a
  * sequential fold in a keyed order, so the `lloydIters = 0` lane replays
  * bit-for-bit in DuckDB and carries a full value oracle. Lloyd-refined
  * codebooks quantize with `round(avg, 6)` (run-to-run stable; recall
  * asserted in specs, like the IVF mean path).
  *
  * Plan shape at scale: codebooks are O(m·ksub·dims/m) = O(ksub·dims) —
  * always broadcast; encoding is one broadcast join + ONE shuffle of
  * (corpus × m) compact rows (partial agg folds the ksub candidates
  * map-side); ADC scoring is a broadcast join + one shuffle of
  * (corpus × |Q|) partial-aggregated rows. The corpus is never on the build
  * side of anything. Composing with [[Ann.ivfTopK]] cells (IVF-PQ: PQ codes
  * within probed cells only) is the standard extension — the cell filter
  * simply replaces the full-corpus `codes` input here.
  */
object Pq {

  /** L2² between two numeric arrays as a sequential fold (replayable). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x.cast("double") - c.cast("double"))
      * (x.cast("double") - c.cast("double"))), lit(0.0), (acc, v) => acc + v)

  /** (rid, sub, sv) subvector rows — row-local, no shuffle. The vector is
    * materialized in its own Project before the slices index into it
    * (CLAUDE.md rule 3); `explode_outer` dodges the infer-filter re-inline
    * trap (see Dedup.wordShingles). */
  private def subvectors(df: DataFrame, id: String, vec: String,
                         m: Int, dsub: Int): DataFrame = {
    val staged = df.select(col(id).as("rid"), col(vec).as("v"))
    staged.select(col("rid"),
      explode_outer(array((0 until m).map(s =>
        struct(lit(s).as("sub"), slice(col("v"), s * dsub + 1, dsub).as("sv"))): _*))
        .as("e"))
      .select(col("rid"), col("e.sub").as("sub"), col("e.sv").as("sv"))
  }

  /** Per-subspace codebooks (sub, code, word: array<double>).
    *
    * Seeds: the `ksub` vectors with id ≡ 0 (mod n/ksub) — the same value
    * predicate as [[Ann.ivfTopK]]'s centroid pick, so the choice cannot
    * depend on partition arrival order. `lloydIters` k-means steps refine
    * each subspace independently (element mean per (sub, code, pos),
    * `round(6)` to quantize partial-sum association noise away). */
  def codebooks(corpus: DataFrame, id: String, vec: String, m: Int, dsub: Int,
                ksub: Int, lloydIters: Int = 0): DataFrame = {
    val c = corpus.select(col(id).as("cid"), col(vec).as("cv"))
    val n = c.count()
    val stride = math.max(1L, n / ksub)
    val seeds = c.filter(col("cid") % stride === 0 && col("cid") < stride * ksub)
      .select((col("cid") / stride).cast("int").as("code"), col("cv").as("v"))
    var cb = subvectors(seeds.withColumnRenamed("code", "rid"), "rid", "v", m, dsub)
      .select(col("sub"), col("rid").cast("int").as("code"),
        transform(col("sv"), x => x.cast("double")).as("word"))
    for (_ <- 0 until lloydIters) {
      val cSubs = subvectors(c, "cid", "cv", m, dsub)
      val assigned = encode(cSubs, cb) // (rid, sub, code)
      cb = assigned.join(cSubs, Seq("rid", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(round(avg(col("x")), 6).as("mx"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
        .select(col("sub"), col("code"), expr("transform(pm, p -> p.mx)").as("word"))
    }
    cb
  }

  /** Nearest codeword per (row, subspace): broadcast join against the
    * codebook, hash-aggregable argmin (L2², ties to the smallest code).
    * Returns (rid, sub, code). */
  def encode(subRows: DataFrame, cb: DataFrame): DataFrame =
    subRows.join(broadcast(cb), Seq("sub"))
      .select(col("rid"), col("sub"), col("code"), l2sq(col("sv"), col("word")).as("d"))
      .groupBy("rid", "sub")
      .agg(AggExpressions.minByPair(col("code"), col("d"), col("code")).as("code"))

  /** Exhaustive ADC top-k over PQ codes: for each query, the k corpus rows
    * with the highest approximate cosine (self excluded). Ranking key is
    * (round(score, 6) DESC, id ASC) — engine-independent near-tie order. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
             k: Int, m: Int, dsub: Int, ksub: Int = 16,
             lloydIters: Int = 0): DataFrame = {
    val c = corpus.select(col(id).as("cid"), col(vec).as("cv"))
    // codebook feeds the encode join AND the ADC table — localCheckpoint
    // stops the whole seed/refine derivation re-running per consumer
    val cb = codebooks(corpus, id, vec, m, dsub, ksub, lloydIters).localCheckpoint()
    val codes = encode(subvectors(c, "cid", "cv", m, dsub), cb)
    // ADC table: per (query, sub, code) the query-side dot and the
    // codeword's own energy (for |x̂|); qn = |q| rides along each row
    val q = queries.select(col(id).as("query_id"), col(vec).as("qv"))
      .withColumn("qn", sqrt(Ann.dotFold(col("qv"), col("qv"))))
    val qSubs = subvectors(q, "query_id", "qv", m, dsub)
      .join(q.select(col("query_id").as("rid"), col("qn")), "rid")
    val adc = qSubs.join(broadcast(cb), Seq("sub"))
      .select(col("rid").as("query_id"), col("qn"), col("sub"), col("code"),
        Ann.dotFold(col("sv"), col("word")).as("t"),
        Ann.dotFold(col("word"), col("word")).as("nn"))
    // score: both cross-subspace sums are sequential folds in sub order
    // (float-determinism rule — never a groupBy SUM of doubles)
    val scored = codes.join(broadcast(adc), Seq("sub", "code"))
      .filter(col("query_id") =!= col("cid"))
      .groupBy(col("query_id"), col("cid"))
      .agg(min(col("qn")).as("qn"),
        aggregate(array_sort(collect_list(struct(col("sub"), col("t")))),
          lit(0.0), (a, x) => a + x.getField("t")).as("sum_t"),
        aggregate(array_sort(collect_list(struct(col("sub"), col("nn")))),
          lit(0.0), (a, x) => a + x.getField("nn")).as("sum_nn"))
      .withColumn("score", round(col("sum_t") / (col("qn") * sqrt(col("sum_nn"))), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("cid").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cid").as("neighbor_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }
}
