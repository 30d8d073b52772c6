package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Projections
import graft.sources.{Sinks, SyntheticMarket}

/** The reference's main batch driver re-expressed as a Spark job
  * (`download_all_data`, scripts/download_efficient.py:204-455 — SURVEY §3.2).
  *
  * The reference loops stock-by-stock in batches of 20 because BaoStock
  * forbids concurrency; here the "loop" is partition parallelism over one
  * wide frame, and "resume" is upsert idempotency:
  *
  *  1. one wide unified scan (S1/S2) covering the full universe × range;
  *  2. routed split (P2) into market / valuation / status off ONE cached
  *     scan (the reference's scan-consolidation optimization, SURVEY §4 r1);
  *  3. partitioned sinks (K1/K7) + calendar (K9) + per-symbol metadata (K5);
  *  4. incremental mode = the same job over a trailing window, MERGE-upserted
  *     into the existing tables (J4; download_efficient.py:228-229) —
  *     re-running the same increment is a no-op.
  */
object MarketPipeline {

  case class Layout(root: String) {
    def market: String = s"$root/market"
    def valuation: String = s"$root/valuation"
    def status: String = s"$root/status"
    def calendar: String = s"$root/calendar"
    def metadata: String = s"$root/stock_metadata"
  }

  private val routes = Map(
    "market" -> (Seq("symbol", "date", "close", "open", "high", "low", "volume"), Map.empty[String, String]),
    "valuation" -> (Seq("symbol", "date", "peTTM", "pbMRQ"),
      Map("peTTM" -> "pe_ttm", "pbMRQ" -> "pb")),
    "status" -> (Seq("symbol", "date", "isST", "tradestatus"), Map.empty[String, String]))

  /** Full run: generate → split → write everything. */
  def fullRun(spark: SparkSession, layout: Layout, gen: SyntheticMarket): Unit = {
    val wide = gen.unifiedDaily.cache()
    try {
      val split = Projections.routedSplit(wide, routes)
      Sinks.writePartitioned(split("market"), layout.market)
      Sinks.writePartitioned(split("valuation"), layout.valuation)
      Sinks.writePartitioned(split("status"), layout.status)
      Sinks.writeDim(gen.calendar, layout.calendar)
      Sinks.writeDim(
        wide.groupBy("symbol").agg(
          min(col("date")).as("listed_date"), max(col("date")).as("de_listed_date")),
        layout.metadata)
    } finally wide.unpersist()
  }

  /** Incremental run over a trailing window of `lastDays` trading days:
    * regenerate just that window and MERGE it into the existing tables.
    * Idempotent — re-running the same window changes nothing. */
  def incrementalRun(spark: SparkSession, layout: Layout, gen: SyntheticMarket,
                     lastDays: Int): Unit = {
    val maxDate = spark.read.parquet(layout.market).agg(max(col("date"))).head().getDate(0)
    val cutoff = java.time.LocalDate.parse(maxDate.toString).minusDays(lastDays.toLong)
    val wide = gen.unifiedDaily.filter(col("date") > lit(cutoff.toString)).cache()
    try {
      val split = Projections.routedSplit(wide, routes)
      Sinks.upsertPartitioned(spark, layout.market, split("market"), Seq("symbol", "date"))
      Sinks.upsertPartitioned(spark, layout.valuation, split("valuation"), Seq("symbol", "date"))
      Sinks.upsertPartitioned(spark, layout.status, split("status"), Seq("symbol", "date"))
    } finally wide.unpersist()
  }

  /** K11-style catalog probe over the written store. */
  def existingSymbols(spark: SparkSession, layout: Layout): DataFrame =
    Sinks.existingSymbols(spark, layout.market)
}
