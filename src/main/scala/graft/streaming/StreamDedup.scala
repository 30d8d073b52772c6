package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup stage — the streaming counterpart of
  * `Dedup.exact` for an ingest pipeline: drop re-deliveries of the same
  * payload as documents arrive, BEFORE they reach storage or the batch
  * dedup passes.
  *
  * Two variants with different state contracts:
  *  - [[dropRedelivered]] uses `dropDuplicatesWithinWatermark` on the
  *    content hash: state for a hash is kept only until the watermark
  *    passes its first arrival + `lateness` — bounded state, the ONLY
  *    shape that survives an unbounded stream. Duplicates separated by
  *    more than the lateness window are the batch layer's job (exact
  *    dedup over storage), which is the standard lambda split.
  *  - [[dropRedeliveredGlobal]] uses plain `dropDuplicates` — exact
  *    across the whole stream lifetime but state grows with distinct
  *    keys; acceptable for bounded replays/backfills only.
  *
  * Both dedup on md5(text) + length guard, the same key as the batch
  * `dedup_exact` gate query, so stream + batch layers agree on identity.
  */
object StreamDedup {

  def withContentHash(docs: DataFrame, text: String): DataFrame =
    docs.withColumn("content_hash", md5(col(text)))
      .withColumn("content_len", length(col(text)).cast("long"))

  /** Bounded-state streaming dedup: requires an event-time column
    * (`tsCol`) to anchor the watermark. */
  def dropRedelivered(docs: DataFrame, text: String, tsCol: String,
                      lateness: String = "10 minutes"): DataFrame =
    withContentHash(docs, text)
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("content_hash", "content_len")

  /** Unbounded-state variant for bounded replays. */
  def dropRedeliveredGlobal(docs: DataFrame, text: String): DataFrame =
    withContentHash(docs, text).dropDuplicates("content_hash", "content_len")
}
