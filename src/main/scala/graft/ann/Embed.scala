package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic text → vector builders that need no trained model —
  * the embeddings a pipeline can compute ON the cluster, for blocking,
  * cheap retrieval, and near-dup candidate generation.
  */
object Embed {

  /** Feature-hashed bag-of-words ("the hashing trick", Weinberger et al.
    * 2009, arXiv:0902.2206; the fastText input layer discipline): every
    * word occurrence lands in bucket `md5(word) % dim` with a ±1 sign
    * drawn from an independent md5 slice (the signed variant keeps the
    * hash collisions mean-zero), and a document's vector is the per-bucket
    * signed occurrence count. All-integer output — (doc_id, dim, weight)
    * exploded sparse form, exact in BIGINT — so the gate is hash-exact
    * where a normalized float embedding would drift.
    *
    * Scale posture: one projection (split + explode + two md5s) and ONE
    * map-side-combinable aggregate keyed (doc_id, bucket) — no vocabulary
    * state, no driver collect, and `dim` bounds each doc's output rows.
    * The same hash on any engine/day/cluster yields the same vector
    * (the Sampling.hashBucket / Dedup.Md5Hash determinism family). */
  def hashedBow(docs: DataFrame, id: String, text: String,
                dim: Int): DataFrame = {
    require(dim > 0, s"degenerate hash-embedding dim $dim")
    val w = docs.select(col(id).as("doc_id"),
      explode(graft.functions.TextFns.words(col(text))).as("word"))
    // bucket from md5 chars 1-15 (the Sampling.hashBucket derivation),
    // sign from chars 16-30 — independent slices of one digest
    val bucket = conv(substring(md5(col("word")), 1, 15), 16, 10)
      .cast("long") % dim
    val sign = when(
      conv(substring(md5(col("word")), 16, 15), 16, 10).cast("long") % 2 === 0,
      1L).otherwise(-1L)
    w.select(col("doc_id"), bucket.as("dim"), sign.as("s"))
      .groupBy("doc_id", "dim")
      .agg(sum(col("s")).as("weight"))
  }
}
