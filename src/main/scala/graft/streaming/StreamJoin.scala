package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the two-unbounded-inputs member of the
  * join family (§2.9): each left event pairs with the right-stream rows
  * carrying the same key whose timestamp falls in
  * [leftTs, leftTs + window] (attribution, enrichment, request/response
  * stitching).
  *
  * This is the ONLY join shape that survives two unbounded streams: the
  * watermarks plus the range condition bound both sides' state — Spark
  * can discard a buffered row the moment the opposite watermark passes
  * the end of its join window, so state is O(rate × (window + lateness)),
  * never O(stream). An equi-join without the range bound would buffer
  * forever (Spark rejects it without watermark bounds for exactly that
  * reason).
  *
  * Inner matches emit as soon as both sides arrive; the watermark governs
  * state cleanup (and emission timing only for outer variants).
  */
object StreamJoin {

  /** `left`/`right` must share ONLY the join key column name; all other
    * columns pass through under their own names. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   window: String = "10 minutes",
                   lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, "__rkey").alias("r")
    l.join(r,
        col(key) === col("__rkey") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"))
      .drop("__rkey")
  }

  /** LEFT OUTER interval join — a genuinely different state machine from
    * the inner variant: a left row cannot be declared UNMATCHED until the
    * right watermark has passed the END of its join window
    * `[leftTs, leftTs + window]` (only then is "no right row will ever
    * arrive in the window" a theorem), so null-extended rows emit on
    * watermark advance, batches after their match window closes — while
    * inner matches still emit as soon as both sides arrive. Spark's
    * StreamingSymmetricHashJoinExec keeps the left row in state past its
    * own watermark for exactly this interval, evicting on emission.
    *
    * One-batch replay caveat (the Replay gate): the watermark never
    * advances DURING the single micro-batch, but the no-data batch after
    * it advances the watermark to (max event time − lateness), so left
    * rows whose window end is BEHIND that final watermark do emit their
    * null-extended form — the batch-SQL oracle replays that cutoff the
    * same way stream_bars replays its emission cutoff. */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            window: String = "10 minutes",
                            lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, "__rkey").alias("r")
    l.join(r,
        col(key) === col("__rkey") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
        "left_outer")
      .drop("__rkey")
  }

  /** FULL OUTER interval join — both null-extension theorems at once,
    * and they are ASYMMETRIC: an unmatched LEFT row waits for the
    * watermark to pass the END of its look-ahead window
    * `[leftTs, leftTs + window]`, while an unmatched RIGHT row waits only
    * for the watermark to pass its OWN timestamp (its potential matchers
    * sit in `[rightTs − window, rightTs]` — all at-or-before it, so once
    * the watermark passes rightTs no matcher can still arrive). The
    * one-batch replay oracle encodes both cutoffs. The key column is
    * emitted COALESCEd (a full-outer's key is null on exactly one side of
    * each null-extended row). */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame, key: String,
                            leftTs: String, rightTs: String,
                            window: String = "10 minutes",
                            lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness).alias("l")
    val r = right.withWatermark(rightTs, lateness)
      .withColumnRenamed(key, "__rkey").alias("r")
    l.join(r,
        col(key) === col("__rkey") &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window"),
        "full_outer")
      .withColumn(key, coalesce(col(key), col("__rkey")))
      .drop("__rkey")
  }
}
