package graft

import org.apache.spark.sql.functions._
import graft.api.Backtest
import graft.domain.MarketViews

/** Consumer acceptance test mirroring the reference's strategy usage
  * (SURVEY §5.3: dual-MA crossover over get_history output). */
class BacktestSpec extends SparkSpec {
  import spark.implicits._

  test("dual-MA crossover emits alternating buy/sell per symbol") {
    val bars = MarketViews(spark, sf0001).bars
      .filter(col("symbol").isin("000001.SZ", "000002.SZ"))
    val sig = Backtest.dualMaSignals(bars).cache()
    val counts = sig.groupBy("signal").count().as[(String, Long)].collect().toMap
    assert(counts.getOrElse("buy", 0L) > 0, "some buys")
    assert(counts.getOrElse("sell", 0L) > 0, "some sells")
    // per symbol, in date order, buys and sells strictly alternate
    val seqs = sig.filter(col("signal") =!= "hold")
      .orderBy("symbol", "date")
      .select("symbol", "signal").as[(String, String)].collect()
      .groupBy(_._1).values.map(_.map(_._2).toList)
    seqs.foreach { s =>
      s.sliding(2).foreach {
        case List(a, b) => assert(a != b, s"signals must alternate, got $s")
        case _ =>
      }
    }
  }

  test("equity curve only accrues P&L while long, and is deterministic") {
    val bars = MarketViews(spark, sf0001).bars.filter(col("symbol") === "000001.SZ")
    val eq = Backtest.equityCurve(Backtest.dualMaSignals(bars)).cache()
    // P&L on days where the prior position was flat must be zero
    val flat = eq.filter(col("position") === 0 && col("signal") === "hold" && col("daily_pnl") =!= 0.0)
    // (position column is post-signal; a sell day can still carry pnl)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("symbol")).orderBy(col("date"))
    val withPrev = eq.withColumn("prev_pos", lag(col("position"), 1).over(w))
    assert(withPrev.filter(col("prev_pos") === 0 && col("daily_pnl") =!= 0.0).count() == 0)
    val a = eq.agg(sum("cum_pnl")).as[Double].head()
    val b = Backtest.equityCurve(Backtest.dualMaSignals(bars)).agg(sum("cum_pnl")).as[Double].head()
    assert(a == b)
  }

  test("metrics: hand-checked drawdown, Sharpe core, and counts") {
    // pnl path 1, -2, 0.5, -1, 3 → cum 1,-1,-.5,-1.5,1.5; peak path
    // 1,1,1,1,1.5; max drawdown = 2.5; total = 1.5
    val curve = Seq(
      ("S", "2024-01-01", "buy", 1, 1.0), ("S", "2024-01-02", "hold", 1, -2.0),
      ("S", "2024-01-03", "hold", 1, 0.5), ("S", "2024-01-04", "sell", 0, -1.0),
      ("S", "2024-01-05", "buy", 1, 3.0)
    ).toDF("symbol", "date", "signal", "position", "daily_pnl")
    val m = Backtest.metrics(curve)
      .select("n_days", "n_buys", "days_long", "total_pnl", "max_drawdown")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(m._1 == 5L && m._2 == 2L && m._3 == 4L)
    assert(m._4 == 1.5 && m._5 == 2.5, s"got $m")
    // degenerate: constant pnl → zero variance → null sharpe
    val flat = Seq(("F", "2024-01-01", "hold", 0, 0.0),
      ("F", "2024-01-02", "hold", 0, 0.0))
      .toDF("symbol", "date", "signal", "position", "daily_pnl")
    assert(Backtest.metrics(flat).select("sharpe_core").head().isNullAt(0))
  }
}
