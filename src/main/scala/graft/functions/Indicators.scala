package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical indicators (the reference's documented indicator surface:
  * MA / EMA / MACD / RSI — TEST_COVERAGE_REPORT.md:115-118, BASELINE.md
  * "technical-indicator calc" row), as distributed window programs.
  *
  * EMA is a recurrence, which windows can't express directly; it is computed
  * as a sequential fold over a bounded trailing window of `K` rows
  * (`aggregate(collect_list(x) over w)`): the dropped contribution is
  * (1−α)^K ≈ 1e-17 for K=100/span=12, far below double precision. The fold
  * is the same left fold DuckDB's `list_reduce` performs, so results are
  * engine-exact. Cost is O(K) per row — bounded, no per-key driver state.
  */
object Indicators {

  /** Simple moving average over n rows (delegates to the window op). */
  def sma(df: DataFrame, keys: Seq[Column], order: Seq[Column],
          value: Column, n: Int, as: String): DataFrame =
    graft.ops.Windows.movingAvg(df, keys, order, value, n, as)

  /** EMA column over a bounded trailing window of `k` rows:
    * fold(acc, v) = α·v + (1−α)·acc seeded with the window's oldest value. */
  def emaCol(keys: Seq[Column], order: Seq[Column], value: Column,
             span: Int, k: Int = 100): Column = {
    val a = 2.0 / (span + 1)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(k - 1), 0)
    val arr = collect_list(value).over(w)
    aggregate(
      slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
      element_at(arr, 1),
      (acc, v) => v * a + acc * (1 - a))
  }

  /** MACD line (EMA_fast − EMA_slow) and its signal line (EMA of the MACD
    * line). Two window passes, both bounded folds. */
  def withMacd(df: DataFrame, keys: Seq[Column], order: Seq[Column], value: Column,
               fast: Int = 12, slow: Int = 26, signal: Int = 9, k: Int = 100): DataFrame = {
    val macd = emaCol(keys, order, value, fast, k) - emaCol(keys, order, value, slow, k)
    val withM = df.withColumn("macd", macd)
    withM.withColumn("macd_signal", emaCol(keys, order, col("macd"), signal, k))
  }

  /** Simple RSI over n periods: 100 − 100/(1 + avgGain/avgLoss), with
    * decimal-routed sums for engine-exact averages. All-gain windows → 100. */
  def withRsi(df: DataFrame, keys: Seq[Column], order: Seq[Column], value: Column,
              n: Int = 14, as: String = "rsi"): DataFrame = {
    val wLag = Window.partitionBy(keys: _*).orderBy(order: _*)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    val diff = value - lag(value, 1).over(wLag)
    val gain = when(diff > 0, diff).otherwise(lit(0.0))
    val loss = when(diff < 0, -diff).otherwise(lit(0.0))
    // sequential fold, not decimal-cast window sum: the frame order is
    // deterministic, so a left fold is engine-exact WITHOUT quantizing the
    // full-entropy gains onto the decimal lattice (where cast-rounding can
    // disagree across engines)
    val sumG = aggregate(collect_list(gain).over(w), lit(0.0), (a, v) => a + v)
    val sumL = aggregate(collect_list(loss).over(w), lit(0.0), (a, v) => a + v)
    df.withColumn(as,
      when(sumG.isNull || sumL.isNull, lit(null))
        .when(sumL === 0.0, lit(100.0))
        .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + sumG / sumL)))
  }
}
