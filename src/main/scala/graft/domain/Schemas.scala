package graft.domain

import org.apache.spark.sql.types._

/** Canonical long-format schemas for the market-data engine (SURVEY.md §1).
  * Declared once; every producer `select`s against these — never inference.
  *
  * Types follow the reference's contracts (FIXTURES.md): analytics are
  * double, adjust factors float32, dates are DateType (the reference
  * normalizes timestamps to midnight), PTrade ex-rights dates int YYYYMMDD
  * at the serving edge only.
  */
object Schemas {

  /** OHLCV bars — one row per (symbol, trading day); reference column order
    * close-first after the market split (data_splitter.py:17-23). */
  val bars: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("close", DoubleType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("volume", DoubleType),
    StructField("money", DoubleType)))

  /** Daily valuation series (data_converter.py:37-43 field map). */
  val valuation: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("pe_ttm", DoubleType),
    StructField("pb", DoubleType),
    StructField("ps_ttm", DoubleType),
    StructField("pcf", DoubleType),
    StructField("turnover_rate", DoubleType),
    StructField("total_shares", DoubleType),
    StructField("total_value", DoubleType),
    StructField("float_value", DoubleType)))

  /** Quarterly fundamentals with publication date for point-in-time
    * correctness (J6; PTrade_API_mini_Reference.md:3316-3337). */
  val fundamentals: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("end_date", DateType, nullable = false),
    StructField("publ_date", DateType, nullable = false),
    StructField("revenue", DoubleType),
    StructField("net_profit", DoubleType),
    StructField("roe", DoubleType)))

  /** Adjust-factor series — float32 by reference contract
    * (data_converter.py:315). */
  val adjFactors: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("backward_a", FloatType)))

  /** Trading calendar — the join spine for every query. */
  val calendar: StructType = StructType(Seq(
    StructField("trade_date", DateType, nullable = false)))

  /** Static per-security dimension (h5_writer.py:179-209, typed instead of
    * the reference's all-string HDF5 workaround). */
  val stockMetadata: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("stock_name", StringType),
    StructField("listed_date", DateType),
    StructField("de_listed_date", DateType)))
}
