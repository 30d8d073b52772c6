package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * One reader per table; plain `spark.read.parquet` so Catalyst gets full
  * pushdown (column pruning + min/max skipping) into the scan. At cluster
  * scale these would be date-partitioned directories — the API is the same.
  */
final case class TestData(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** Events with the engine's timestamp contract applied: a raw nanosecond
    * long `ts_ns` (exact, comparison-safe) plus a µs-precision
    * `TimestampType` column `ts`. See [[TestData.normalizeEventTs]] for the
    * fixture generations this adapts to.
    */
  def events: DataFrame = TestData.normalizeEventTs(t("events"))

  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object TestData {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  /** Normalize an events frame's `ts` column to the engine contract:
    * `ts_ns` (long, exact nanoseconds since epoch) + `ts` (TimestampType,
    * µs precision). Adapts to either fixture generation by schema:
    *
    *  - INT64 nanosecond parquet, read as a raw long under
    *    `spark.sql.legacy.parquet.nanosAsLong` → `ts_ns` is the value
    *    itself; `ts` = timestamp_micros(ts_ns DIV 1000). Integer DIV, never
    *    `/`: double-routed division of ~1e18 ns loses sub-ms precision
    *    (CLAUDE.md rule 5).
    *  - TIMESTAMP(MICROS) parquet (`TIMESTAMP_NTZ` when
    *    isAdjustedToUTC=false, `TIMESTAMP` otherwise) → `ts_ns` =
    *    unix_micros(ts) · 1000 in long arithmetic. Sessions pin the
    *    timezone to UTC (graft.Sessions), so the NTZ wall clock IS the
    *    instant and the cast to TimestampType is identity on it; DuckDB's
    *    `epoch_ns(ts)` of the same µs value is µs·1000 — the oracle and
    *    this derivation agree exactly.
    *
    * Any other `ts` type fails loudly so a future fixture regeneration
    * breaks with a named cause instead of an analysis-time DIV mismatch.
    * Works on batch and streaming frames alike (pure column expressions).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    case _: TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(TimestampType))
        .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    case _: TimestampType =>
      df.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    case other =>
      throw new IllegalStateException(
        s"events fixture contract violated: `ts` must be INT64 nanos (read " +
          s"under nanosAsLong) or TIMESTAMP(MICROS), got $other — " +
          "update graft.sources.TestData.normalizeEventTs for the new layout")
  }
}
