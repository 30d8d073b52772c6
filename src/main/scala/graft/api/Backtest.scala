package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** The reference's de-facto acceptance consumer: a dual moving-average
  * crossover strategy (strategies/simple/backtest.py:56-67 — MA5/MA20 off
  * `get_history(21, "1d", "close")`), re-expressed as one window program
  * over the long bars table for ALL symbols at once — the per-bar Python
  * loop becomes a lag-over-window signal table.
  *
  * Buy when MA_fast crosses above MA_slow, sell on the reverse cross.
  */
object Backtest {

  /** Signal table: (symbol, date, close, ma_fast, ma_slow, signal) where
    * signal ∈ {buy, sell, hold}. Crossings compare today's MA relation with
    * yesterday's (lag) — exactly the reference's "金叉/死叉" rule. */
  def dualMaSignals(bars: DataFrame, fast: Int = 5, slow: Int = 20): DataFrame = {
    val keys = Seq(col("symbol"))
    val ord = Seq(col("date"))
    val withMa = Windows.movingAvg(
      Windows.movingAvg(bars, keys, ord, col("close"), fast, "ma_fast"),
      keys, ord, col("close"), slow, "ma_slow")
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val above = col("ma_fast") > col("ma_slow")
    val prevAbove = lag(above, 1).over(w)
    withMa.withColumn("signal",
      when(prevAbove.isNull, lit("hold"))
        .when(above && !prevAbove, lit("buy"))
        .when(!above && prevAbove, lit("sell"))
        .otherwise(lit("hold")))
  }

  /** Naive long-only equity curve per symbol: position toggles on buy/sell,
    * P&L accrues close-to-close while long. Window cumulative sum — no
    * per-symbol loops, distributes across symbols. */
  def equityCurve(signals: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    // position AFTER today's signal = 1 iff the most recent non-hold signal
    // is a buy. (NOT a clamped running sum of ±1 toggles: a sell arriving
    // before any buy would pin that sum at −1 and a later buy could never
    // open the position.)
    val lastSignal = last(
      when(col("signal") =!= "hold", col("signal")), ignoreNulls = true).over(wCum)
    val position = when(lastSignal === "buy", 1).otherwise(0)
    val ret = (col("close") / lag(col("close"), 1).over(w)) - 1.0
    val held = lag(position, 1).over(w)
    signals.withColumn("position", position)
      .withColumn("daily_pnl", when(held === 1 && ret.isNotNull, ret).otherwise(0.0))
      .withColumn("cum_pnl", sum(col("daily_pnl")).over(wCum))
  }
}
