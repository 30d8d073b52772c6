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

  /** Pairwise daily-return correlation matrix across symbols — the
    * portfolio-construction primitive (risk models, hierarchical
    * clustering, pairs selection).
    *
    * Plan shape: returns (one per-symbol window pass) self-join on DATE —
    * a date-co-shuffled equi-join, so each date's N returns meet once and
    * the pair explosion is N²/2 per date, never a full cross join. Pair
    * stats follow [[graft.ops.Windows.rollingCorr]]'s determinism recipe:
    * per-pair series collected and SORTED by date, sums as sequential
    * folds, the rational corr tree. At thousands of symbols, block the
    * matrix (or go Gramian) — N² pairs is the method's intrinsic output.
    *
    * Returns (sym_a, sym_b, n_days, corr) for pairs with ≥ `minOverlap`
    * aligned return days; degenerate (zero-variance) series yield null. */
  def returnsCorrMatrix(bars: DataFrame, minOverlap: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val rets = bars
      .withColumn("ret", col("close") / lag(col("close"), 1).over(w) - 1.0)
      .filter(col("ret").isNotNull)
      .select(col("symbol"), col("date"), col("ret"))
    val a = rets.select(col("symbol").as("sym_a"), col("date"), col("ret").as("ra"))
    val b = rets.select(col("symbol").as("sym_b"), col("date"), col("ret").as("rb"))
    val fold0 = (l: Column) => aggregate(l, lit(0.0), (x, e) => x + e)
    val foldSq = (l: Column) => aggregate(l, lit(0.0), (x, e) => x + e * e)
    a.join(b, Seq("date")).filter(col("sym_a") < col("sym_b"))
      .groupBy("sym_a", "sym_b")
      .agg(sort_array(collect_list(struct(col("date"), col("ra"), col("rb")))).as("lst0"))
      .select(col("sym_a"), col("sym_b"),
        transform(col("lst0"), s => s.getField("ra")).as("la"),
        transform(col("lst0"), s => s.getField("rb")).as("lb"))
      .filter(size(col("la")) >= minOverlap)
      .select(col("sym_a"), col("sym_b"),
        size(col("la")).cast("long").as("n_days"),
        col("la"), col("lb"),
        size(col("la")).cast("double").as("nn"),
        fold0(col("la")).as("sx"), fold0(col("lb")).as("sy"),
        foldSq(col("la")).as("sxx"), foldSq(col("lb")).as("syy"),
        fold0(zip_with(col("la"), col("lb"), (x, y) => x * y)).as("sxy"))
      .select(col("sym_a"), col("sym_b"), col("n_days"), {
        val num = col("nn") * col("sxy") - col("sx") * col("sy")
        val dx = col("nn") * col("sxx") - col("sx") * col("sx")
        val dy = col("nn") * col("syy") - col("sy") * col("sy")
        when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy))).as("corr")
      })
  }

  /** Per-symbol BETA against the equal-weight market return — the CAPM
    * exposure next to [[returnsCorrMatrix]]'s pairwise view, and O(N)
    * where the matrix is O(N²): one market series (per-date mean of the
    * SORTED symbol returns — fold order pinned, the mean's division is
    * one IEEE op on exact-fold inputs), one join back, one per-symbol
    * slope via the [[graft.ops.Windows.rollingSlope]] rational tree over
    * the full aligned window. Returns (symbol, n_days, beta); zero
    * market variance → null. */
  def betasVsMarket(bars: DataFrame, minOverlap: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val rets = bars
      .withColumn("ret", col("close") / lag(col("close"), 1).over(w) - 1.0)
      .filter(col("ret").isNotNull)
      .select(col("symbol"), col("date"), col("ret"))
    val fold0 = (l: Column) => aggregate(l, lit(0.0), (x, e) => x + e)
    val foldSq = (l: Column) => aggregate(l, lit(0.0), (x, e) => x + e * e)
    val market = rets.groupBy("date")
      .agg(sort_array(collect_list(struct(col("symbol"), col("ret")))).as("l"))
      .select(col("date"),
        (aggregate(col("l"), lit(0.0), (a, e) => a + e.getField("ret"))
          / size(col("l")).cast("double")).as("rm"))
    rets.join(market, "date")
      .groupBy("symbol")
      .agg(sort_array(collect_list(struct(col("date"), col("ret"), col("rm")))).as("lst"))
      .filter(size(col("lst")) >= minOverlap)
      .select(col("symbol"),
        size(col("lst")).cast("long").as("n_days"),
        size(col("lst")).cast("double").as("nn"),
        transform(col("lst"), s => s.getField("rm")).as("lx"),
        transform(col("lst"), s => s.getField("ret")).as("ly"))
      .select(col("symbol"), col("n_days"), col("nn"),
        fold0(col("lx")).as("sx"), fold0(col("ly")).as("sy"),
        foldSq(col("lx")).as("sxx"),
        fold0(zip_with(col("lx"), col("ly"), (x, y) => x * y)).as("sxy"))
      .select(col("symbol"), col("n_days"), {
        val num = col("nn") * col("sxy") - col("sx") * col("sy")
        val dx = col("nn") * col("sxx") - col("sx") * col("sx")
        when(dx > 0, num / dx).as("beta")
      })
  }
}
