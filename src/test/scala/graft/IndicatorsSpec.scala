package graft

import org.apache.spark.sql.functions._
import graft.functions.Indicators

class IndicatorsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Double*) =
    vals.zipWithIndex.map { case (v, i) => ("s", i, v) }.toDF("sym", "t", "v")

  private val keys = Seq(col("sym"))
  private val ord = Seq(col("t"))

  test("EMA of a constant series is the constant") {
    val out = series(Seq.fill(30)(5.0): _*)
      .withColumn("ema", Indicators.emaCol(keys, ord, col("v"), 12))
      .select("ema").as[Double].collect()
    assert(out.forall(e => math.abs(e - 5.0) < 1e-12))
  }

  test("EMA tracks a step change toward the new level, monotonically") {
    val out = series((Seq.fill(10)(1.0) ++ Seq.fill(20)(2.0)): _*)
      .withColumn("ema", Indicators.emaCol(keys, ord, col("v"), 5))
      .orderBy("t").select("ema").as[Double].collect()
    assert(math.abs(out(9) - 1.0) < 1e-9)
    val after = out.drop(10)
    assert(after.zip(after.tail).forall { case (a, b) => b >= a }, "monotone approach")
    assert(math.abs(after.last - 2.0) < 1e-3, "converges to the new level")
  }

  test("RSI is 100 for strictly rising and 0-ish for strictly falling series") {
    val up = Indicators.withRsi(series((1 to 30).map(_.toDouble): _*), keys, ord, col("v"))
      .orderBy("t").select("rsi").as[Double].collect()
    assert(up.forall(_ == 100.0))
    val down = Indicators.withRsi(series((30 to 1 by -1).map(_.toDouble): _*), keys, ord, col("v"))
      .filter(col("t") >= 14).select("rsi").as[Double].collect()
    assert(down.forall(r => r < 1e-9))
  }

  test("MACD of a constant series is 0 and the signal follows") {
    val out = Indicators.withMacd(series(Seq.fill(40)(7.0): _*), keys, ord, col("v"))
      .select("macd", "macd_signal").as[(Double, Double)].collect()
    assert(out.forall { case (m, s) => math.abs(m) < 1e-12 && math.abs(s) < 1e-12 })
  }

  test("betasVsMarket: a 2x-levered symbol recovers its analytic beta") {
    // retB = 2·retA exactly ⇒ market = 1.5·retA, beta_A = cov/var = 2/3,
    // beta_B = 4/3 — pure identities, so equality is near-exact
    val bars = Seq(
      ("A", "2024-01-01", 100.0), ("A", "2024-01-02", 110.0),
      ("A", "2024-01-03", 99.0), ("A", "2024-01-04", 108.9),
      ("B", "2024-01-01", 100.0), ("B", "2024-01-02", 120.0),
      ("B", "2024-01-03", 96.0), ("B", "2024-01-04", 115.2))
      .toDF("symbol", "d", "close")
      .select(col("symbol"), to_date(col("d")).as("date"), col("close"))
    val betas = Indicators.betasVsMarket(bars, minOverlap = 3)
      .select("symbol", "n_days", "beta")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(betas.map(_._2).forall(_ == 3L))
    assert(math.abs(betas(0)._3 - 2.0 / 3.0) < 1e-9, s"beta_A: ${betas(0)}")
    assert(math.abs(betas(1)._3 - 4.0 / 3.0) < 1e-9, s"beta_B: ${betas(1)}")
  }
}
