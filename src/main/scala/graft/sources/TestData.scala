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

  /** `ts` arrives as nanosecond-precision parquet INT64; the session reads it
    * as a long (`spark.sql.legacy.parquet.nanosAsLong`). We expose the raw
    * nanos as `ts_ns` (exact, comparison-safe) plus a derived micros
    * timestamp `ts`.
    */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions._
    // integer DIV, never `/`: double-routed division of ~1e18 ns loses
    // sub-microsecond precision (CLAUDE.md rule 5)
    raw.withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
