package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.MarketPipeline
import graft.sources.{Sinks, SyntheticMarket}

/** End-to-end pipeline lifecycle (SURVEY §3.2): full run → catalog probe →
  * incremental MERGE → idempotence. */
class PipelineE2ESpec extends SparkSpec {
  import spark.implicits._

  test("full run, incremental upsert, and idempotent re-run") {
    val layout = MarketPipeline.Layout(
      Files.createTempDirectory("graft-pipeline").toString)
    val gen = SyntheticMarket(spark, seed = 11L, nSymbols = 12, nDays = 80)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    MarketPipeline.fullRun(spark, layout, gen)
    val market = spark.read.parquet(layout.market)
    assert(market.count() == 12 * 80)
    assert(MarketPipeline.existingSymbols(spark, layout).count() == 12)
    assert(Sinks.checkIntegrity(spark, layout.valuation, Seq("symbol", "date", "pe_ttm")))
    assert(Sinks.checkIntegrity(spark, layout.status, Seq("symbol", "date", "tradestatus")))

    // incremental with a CHANGED generator (seed bump simulates revised data
    // arriving for the trailing window)
    val revised = SyntheticMarket(spark, seed = 12L, nSymbols = 12, nDays = 80)
    MarketPipeline.incrementalRun(spark, layout, revised, lastDays = 10)
    val after = spark.read.parquet(layout.market)
    assert(after.count() == 12 * 80, "upsert must not duplicate keys")
    assert(after.columns.sorted.toSeq == market.columns.sorted.toSeq)

    // rows in the trailing window now come from the revised generator
    val maxDate = after.agg(max(col("date"))).head().getDate(0)
    val cut = java.time.LocalDate.parse(maxDate.toString).minusDays(10)
    val window = after.filter(col("date") > lit(cut.toString))
    val expected = revised.unifiedDaily.filter(col("date") > lit(cut.toString))
      .select("symbol", "date", "close")
    assert(window.select("symbol", "date", "close")
      .exceptAll(expected).isEmpty, "window rows must match revised data")

    // idempotence: re-running the same increment changes nothing
    val checksum1 = after.agg(sum(col("close").cast("decimal(25,6)"))).head().getDecimal(0)
    MarketPipeline.incrementalRun(spark, layout, revised, lastDays = 10)
    val checksum2 = spark.read.parquet(layout.market)
      .agg(sum(col("close").cast("decimal(25,6)"))).head().getDecimal(0)
    assert(checksum1 == checksum2)
  }
}
