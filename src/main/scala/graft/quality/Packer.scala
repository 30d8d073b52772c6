package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing — assign token chunks to fixed-capacity bins
  * (the "pack sequences to context length" step between chunking and
  * batching in a training-data pipeline).
  *
  * Semantics: within a bucket, chunks are processed in (docId, chunkId)
  * order; a chunk that would push the open bin past `capacity` closes it
  * and opens the next. Deterministic by construction — no first-fit /
  * best-fit heap whose result depends on arrival order across partitions.
  * A chunk larger than `capacity` gets a bin of its own (the overflow test
  * fires on the next chunk too).
  *
  * Scale posture: packing is sequential ONLY within a bucket (`docId %
  * numBuckets`), so the job is embarrassingly parallel across buckets —
  * pick numBuckets so a bucket's chunk COUNT (ids + token counts only, the
  * fold never carries chunk text) stays ~10⁴–10⁵ and the per-bucket array
  * fold is cheap; at 100 TB that is numBuckets ~ 10⁵, one shuffle, no
  * driver state. Bins never span buckets, so the only packing loss vs a
  * global greedy is one partially-filled final bin per bucket —
  * numBuckets · capacity/2 wasted tokens in expectation, negligible.
  * Consumers join chunk text back on (doc_id, chunk_id).
  *
  * Reference anchor: the reference ships rows to consumers in fixed-size
  * batches (simtradedata download_efficient.py batch loop) — packing is
  * the token-budgeted generalization a sequence-training pipeline needs.
  */
object Packer {

  /** One output row per chunk: (doc_id, chunk_id, n_tokens, bucket, bin,
    * bin_id) with bin local to the bucket and bin_id = bucket·10⁶ + bin
    * globally unique. */
  def packGreedy(chunks: DataFrame, docId: String, chunkId: String,
                 nTokens: String, capacity: Long, numBuckets: Int): DataFrame = {
    require(capacity > 0 && numBuckets > 0)
    val item = struct(col(docId).cast("long").as("d"),
      col(chunkId).cast("long").as("c"), col(nTokens).cast("long").as("n"))
    val grouped = chunks
      .groupBy(pmod(col(docId), lit(numBuckets.toLong)).cast("long").as("bucket"))
      .agg(sort_array(collect_list(item)).as("items"))
    // Fold state (bins-so-far, open bin index, open bin fill); fill starts
    // at capacity so the first chunk always overflows into bin 0.
    val init = struct(
      array().cast("array<bigint>").as("bins"),
      lit(-1L).as("bin"), lit(capacity).as("fill"))
    val folded = grouped.withColumn("bins",
      aggregate(col("items"), init,
        (acc, x) => {
          val overflow = acc("fill") + x("n") > capacity
          val bin = when(overflow, acc("bin") + 1L).otherwise(acc("bin"))
          val fill = when(overflow, x("n")).otherwise(acc("fill") + x("n"))
          struct(concat(acc("bins"), array(bin)).as("bins"),
            bin.as("bin"), fill.as("fill"))
        },
        acc => acc("bins")))
      // zip materialized in its own Project so the generator below doesn't
      // re-inline the whole fold (same trap as Dedup.wordShingles).
      .select(col("bucket"), arrays_zip(col("items"), col("bins")).as("z"))
    folded
      .select(col("bucket"), explode_outer(col("z")).as("e"))
      .select(
        col("e.items.d").as("doc_id"),
        col("e.items.c").as("chunk_id"),
        col("e.items.n").as("n_tokens"),
        col("bucket"),
        col("e.bins").as("bin"),
        (col("bucket") * 1000000L + col("e.bins")).as("bin_id"))
  }
}
