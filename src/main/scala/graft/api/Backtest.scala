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
  def dualMaSignals(bars: DataFrame, fast: Int = 5, slow: Int = 20,
                    exact: Boolean = false): DataFrame = {
    val keys = Seq(col("symbol"))
    val ord = Seq(col("date"))
    // exact = sequential-fold MAs (rule 1): the engine's windowed avg and
    // DuckDB's disagree in summation order on arbitrary doubles, and a
    // 1-ulp MA difference can FLIP a crossover compare — the oracle-gated
    // path folds the frame list so both engines add in frame order.
    def foldMa(df: DataFrame, n: Int, as: String): DataFrame = {
      val w = Window.partitionBy(keys: _*).orderBy(ord: _*).rowsBetween(-(n - 1), 0)
      val l = s"__l_$as"
      df.withColumn(l, collect_list(col("close").cast("double")).over(w))
        .withColumn(as,
          aggregate(col(l), lit(0.0), (a, e) => a + e) / size(col(l)))
        .drop(l)
    }
    val withMa =
      if (exact) foldMa(foldMa(bars, fast, "ma_fast"), slow, "ma_slow")
      else Windows.movingAvg(
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

  /** Per-symbol acceptance metrics over an [[equityCurve]]: trade/exposure
    * counts, total P&L, a Sharpe core, and max drawdown — ONE aggregation,
    * every float via sequential folds so the whole report replays exactly:
    *
    *  - `sharpe_core = Σp / √(n·Σp² − (Σp)²)` — the identity-normalized
    *    mean/popstd ratio ([[graft.ops.Windows.rollingZscore]] tree);
    *    annualize by √252 downstream if desired;
    *  - max drawdown runs a STRUCT-state fold (running cum, running peak,
    *    max peak−cum). NB DuckDB's list_reduce was observed (1.0,
    *    plan-dependently) updating the accumulator struct IN PLACE field
    *    by field — the replay orders fields so none reads an
    *    already-updated one (dd, peak, cum; dd's formula expanded), which
    *    is evaluation-order-proof. See the `api_backtest_metrics` oracle
    *    comment. */
  def metrics(curve: DataFrame): DataFrame = {
    val agg0 = curve.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_days"),
      sum(when(col("signal") === "buy", 1L).otherwise(0L)).as("n_buys"),
      sum(col("position").cast("long")).as("days_long"),
      sort_array(collect_list(struct(col("date"), col("daily_pnl")))).as("lst0"))
    val staged = agg0
      .select(col("symbol"), col("n_days"), col("n_buys"), col("days_long"),
        transform(col("lst0"), s => s.getField("daily_pnl")).as("lst"))
      .select(col("symbol"), col("n_days"), col("n_buys"), col("days_long"),
        size(col("lst")).cast("double").as("nn"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e).as("sx"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e * e).as("sxx"),
        aggregate(col("lst"),
          struct(lit(0.0).as("peak"), lit(0.0).as("dd"), lit(0.0).as("cum")),
          (a, x) => {
            val cumNew = a.getField("cum") + x
            val peakNew = greatest(a.getField("peak"), cumNew)
            struct(peakNew.as("peak"),
              greatest(a.getField("dd"), peakNew - cumNew).as("dd"),
              cumNew.as("cum"))
          }).as("st"))
    staged.select(col("symbol"), col("n_days"), col("n_buys"), col("days_long"),
      col("st").getField("cum").as("total_pnl"),
      when(col("nn") * col("sxx") - col("sx") * col("sx") > 0,
        col("sx") / sqrt(col("nn") * col("sxx") - col("sx") * col("sx")))
        .as("sharpe_core"),
      col("st").getField("dd").as("max_drawdown"))
  }

  /** PORTFOLIO-level metrics: equal-weight combine of every symbol's
    * curve — daily portfolio P&L is the symbol-ordered fold sum of that
    * date's per-symbol P&Ls divided by the TOTAL symbol count (symbols
    * without a bar that day hold cash = 0), then the same Sharpe-core /
    * struct-fold drawdown over the date-ordered portfolio series. One
    * row out; diversification shows up as portfolio |sharpe| typically
    * exceeding the median single symbol's. */
  def portfolioMetrics(curve: DataFrame): DataFrame = {
    val n = curve.select(countDistinct(col("symbol"))).head().getLong(0)
    val daily = curve.groupBy(col("date"))
      .agg(sort_array(collect_list(struct(col("symbol"), col("daily_pnl")))).as("l0"))
      .select(col("date"),
        (aggregate(transform(col("l0"), s => s.getField("daily_pnl")),
          lit(0.0), (a, x) => a + x) / lit(n.toDouble)).as("pnl"))
    val staged = daily
      .agg(sort_array(collect_list(struct(col("date"), col("pnl")))).as("lst0"))
      .select(transform(col("lst0"), s => s.getField("pnl")).as("lst"))
      .select(
        size(col("lst")).cast("long").as("n_days"),
        size(col("lst")).cast("double").as("nn"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e).as("sx"),
        aggregate(col("lst"), lit(0.0), (a, e) => a + e * e).as("sxx"),
        aggregate(col("lst"),
          struct(lit(0.0).as("peak"), lit(0.0).as("dd"), lit(0.0).as("cum")),
          (a, x) => {
            val cumNew = a.getField("cum") + x
            val peakNew = greatest(a.getField("peak"), cumNew)
            struct(peakNew.as("peak"),
              greatest(a.getField("dd"), peakNew - cumNew).as("dd"),
              cumNew.as("cum"))
          }).as("st"))
    staged.select(col("n_days"), lit(n).as("n_symbols"),
      col("st").getField("cum").as("total_pnl"),
      when(col("nn") * col("sxx") - col("sx") * col("sx") > 0,
        col("sx") / sqrt(col("nn") * col("sxx") - col("sx") * col("sx")))
        .as("sharpe_core"),
      col("st").getField("dd").as("max_drawdown"))
  }
}
