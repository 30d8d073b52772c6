package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic seeded synthetic market generator (SURVEY.md §7.1 source
  * mode (a)): `spark.range` + column expressions — no RNG state, no
  * collect, fully distributed and reproducible: every value is a pure
  * function of (seed, symbol index, day index).
  *
  * This replaces the reference's network fetchers for offline use; the
  * statistical shape (log-normal-ish prices via a hash-driven walk,
  * weekday-only calendar, halt stretches, ST flips) mirrors the fixture
  * knobs in FIXTURES.md §1.
  */
final case class SyntheticMarket(spark: SparkSession, seed: Long = 42L,
                                 nSymbols: Int = 100, nDays: Int = 500,
                                 startDate: String = "2020-01-01") {

  private def u(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(lit(seed) +: cols: _*), lit(1000000L)).cast("double") / 1000000.0)

  /** Weekday-only trading calendar. */
  def calendar: DataFrame =
    spark.range(0, nDays * 2L)
      .select(date_add(lit(startDate).cast("date"), col("id").cast("int")).as("trade_date"))
      .filter(dayofweek(col("trade_date")).between(2, 6))
      .limit(nDays)

  /** Unified wide daily frame (S1 contract): one row per symbol × trading
    * day with market + valuation + status columns. */
  def unifiedDaily: DataFrame = {
    // Partition-less window (`WindowExec: No Partition Defined` WARN) is
    // fine HERE only: the calendar is ~250 rows/year by construction —
    // a dimension, never the fact table.
    val cal = calendar.withColumn("day_idx",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("trade_date"))) - 1)
    val syms = spark.range(0, nSymbols.toLong)
      .select(col("id").as("sym_idx"),
        concat(lpad(col("id").cast("string"), 6, "0"),
          when(col("id") % 2 === 0, ".SZ").otherwise(".SS")).as("symbol"))
    val grid = syms.crossJoin(cal)
    val base = 10.0
    // price: deterministic multiplicative walk around a per-symbol base
    val drift = (u(col("sym_idx"), col("day_idx")) - 0.5) * 0.1
    val px = round(lit(base) * (lit(1.0) + (u(col("sym_idx")) * 10.0)) * (lit(1.0) + drift), 4)
    val halted = u(col("sym_idx"), col("day_idx"), lit("halt")) < 0.02
    grid.select(
      col("symbol"), col("trade_date").as("date"),
      px.as("close"),
      round(px * (lit(1.0) + (u(col("sym_idx"), col("day_idx"), lit("o")) - 0.5) * 0.02), 4).as("open"),
      round(px * (lit(1.0) + u(col("sym_idx"), col("day_idx"), lit("h")) * 0.02), 4).as("high"),
      round(px * (lit(1.0) - u(col("sym_idx"), col("day_idx"), lit("l")) * 0.02), 4).as("low"),
      when(halted, 0.0).otherwise(round(u(col("sym_idx"), col("day_idx"), lit("v")) * 1e6, 0)).as("volume"),
      (u(col("sym_idx"), col("day_idx"), lit("pe")) * 50.0 + 5.0).as("peTTM"),
      (u(col("sym_idx"), col("day_idx"), lit("pb")) * 5.0 + 0.5).as("pbMRQ"),
      when(u(col("sym_idx"), col("day_idx"), lit("st")) < 0.05, "1").otherwise("0").as("isST"),
      when(halted, "0").otherwise("1").as("tradestatus"))
  }

  /** The P2 routed split off one cached wide scan (SURVEY §4 row 1:
    * scan consolidation — read once, write three). */
  def split(): Map[String, DataFrame] = {
    val wide = unifiedDaily.cache()
    graft.ops.Projections.routedSplit(wide, Map(
      "market" -> (Seq("symbol", "date", "close", "open", "high", "low", "volume"), Map.empty),
      "valuation" -> (Seq("symbol", "date", "peTTM", "pbMRQ"),
        Map("peTTM" -> "pe_ttm", "pbMRQ" -> "pb")),
      "status" -> (Seq("symbol", "date", "isST", "tradestatus"), Map.empty)))
  }
}
