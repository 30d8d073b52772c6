package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming bar builder — the optional extension beyond the
  * reference's pure-batch pipeline (SURVEY.md §2.9): a tick/event stream
  * folded into tumbling-window OHLCV bars with late-data handling.
  *
  * Input contract: a streaming DataFrame with (symbol string, ts timestamp,
  * px double, qty double), optionally a unique per-symbol sequence column
  * (`seqCol`) for exchange-order tiebreaks. Output: append-mode bars per
  * (symbol, window).
  *
  * Design notes for scale:
  *  - watermark bounds state: windows close `lateness` after the watermark
  *    passes, so state size is O(active symbols × open windows), not O(history);
  *  - min_by/max_by give deterministic open/close without a sort; the order
  *    key is struct(ts, seqCol) when a sequence column is supplied, else
  *    struct(ts, px) — same-timestamp ticks then tie-break on the value
  *    itself (identical (ts, px) ticks are interchangeable for open/close),
  *    honoring the engine rule that ordering keys must be unique;
  *  - the aggregation is a single shuffle on (symbol, window) — the same
  *    partitioning a downstream sink partitioned by (date) can reuse.
  */
object BarBuilder {

  def bars(ticks: DataFrame, windowLen: String = "1 day",
           lateness: String = "10 minutes",
           seqCol: Option[String] = None): DataFrame = {
    val ord = struct(col("ts"), seqCol.map(col).getOrElse(col("px")))
    ticks
      .withWatermark("ts", lateness)
      .groupBy(col("symbol"), window(col("ts"), windowLen).as("w"))
      .agg(
        min_by(col("px"), ord).as("open"),
        max(col("px")).as("high"),
        min(col("px")).as("low"),
        max_by(col("px"), ord).as("close"),
        sum(col("qty")).as("volume"),
        sum(col("px") * col("qty")).as("money"),
        count(lit(1)).as("n_ticks"))
      .select(col("symbol"), col("w.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("money"), col("n_ticks"))
  }

  /** Incremental-refresh driver (the reference's "incremental mode",
    * download_efficient.py:228-229): a parameterized BATCH job over a
    * trailing window, upserted into the bars table via J4 — streaming is not
    * required for parity, this is the Spark-native equivalent. */
  def incrementalRefresh(existing: DataFrame, fresh: DataFrame): DataFrame =
    graft.ops.Joins.upsert(existing, fresh, Seq("symbol", "bar_start"),
      Seq(lit(1)))
}
