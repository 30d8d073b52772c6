package graft.api

import java.time.LocalDate

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.domain.MarketTables

/** Warm POINT-QUERY serving over the published market artifacts — the
  * "publish artifacts, serve elsewhere" half SCALE.md promises.
  *
  * Spark's per-call floor (plan → schedule → collect, ~300-400 ms even
  * warm on local[32]) is architectural: it is a batch planner, not a
  * point-read engine. The reference's consumer
  * (strategies/simple/backtest.py:56-67) issues per-BAR point queries
  * against a local store, and its prior-gen baseline (SQLite) answered
  * them in ~30 ms because the serving tier was an in-process index over
  * published files — NOT a distributed planner. This class is that tier,
  * Spark-honest: Spark derives and PUBLISHES the artifacts
  * ([[graft.domain.MarketStore]] — month-partitioned facts, dim files);
  * one loader job per serving process reads them ONCE into compact
  * sorted-array indexes; every subsequent call is pure JVM (binary
  * search), microseconds warm.
  *
  * 100 TB posture: the per-node working set is the SERVING slice, not the
  * corpus — bars/fundamentals/status for the symbol universe a node
  * serves. The published layout already buckets by month and sorts by
  * (symbol, date) within files, so horizontal sharding = assigning symbol
  * ranges to nodes and loading only their files; nothing in this class
  * assumes the whole corpus fits one heap. (At fixture scale the whole
  * store loads in one pass — measured on the bench's `serving_build`
  * line; per-call latency on `serving_ms`.)
  *
  * Served shapes (the three `latency_ms` bench shapes, same semantics as
  * the DataFrame API they mirror — spec-pinned against it):
  *  - [[price]]      ≡ PTradeApi.getPrice(fq = "none", default fields)
  *  - [[fundamentalsAsOf]] ≡ PTradeApi.getFundamentalsAsOf(mergeType = 0)
  *  - [[stockStatus]]      ≡ PTradeApi.getStockStatus
  */
final class PointServe private (
    barsBySym: java.util.HashMap[String, PointServe.BarsCol],
    fundBySym: java.util.HashMap[String, PointServe.FundCol],
    metaSyms: Array[String],
    metaDelisted: Array[Int]) {

  import PointServe._

  private val metaSet = {
    val s = new java.util.HashSet[String]()
    metaSyms.foreach(s.add)
    s
  }

  private def dInt(date: String): Int = LocalDate.parse(date).toEpochDay.toInt

  /** OHLCV rows for `securities` within [start, end] — binary-searched
    * slice per symbol, no engine in the path. */
  def price(securities: Seq[String], start: String, end: String): Seq[PricePoint] = {
    val lo = dInt(start); val hi = dInt(end)
    val out = Seq.newBuilder[PricePoint]
    securities.foreach { s =>
      val cols = barsBySym.get(s)
      if (cols != null) {
        var i = lowerBound(cols.dates, lo)
        while (i < cols.dates.length && cols.dates(i) <= hi) {
          out += PricePoint(s, LocalDate.ofEpochDay(cols.dates(i).toLong),
            cols.open(i), cols.high(i), cols.low(i), cols.close(i),
            cols.volume(i), cols.money(i))
          i += 1
        }
      }
    }
    out.result()
  }

  /** Latest version-1 report published at or before `qdate`, per security
    * (metadata symbols with no report yet emit nulls — the left as-of). */
  def fundamentalsAsOf(securities: Seq[String], qdate: String): Seq[FundPoint] = {
    val q = dInt(qdate)
    securities.flatMap { s =>
      if (!metaSet.contains(s)) None
      else {
        val f = fundBySym.get(s)
        val i = if (f == null) -1 else upperBound(f.publ, q) - 1
        if (i < 0)
          Some(FundPoint(s, LocalDate.parse(qdate), None, None, None, None))
        else
          Some(FundPoint(s, LocalDate.parse(qdate),
            Some(LocalDate.ofEpochDay(f.end(i).toLong)),
            Some(f.revenue(i)), Some(f.roe(i)), Some(1)))
      }
    }
  }

  /** Halt/delist verdicts for every metadata symbol on `date`. */
  def stockStatus(date: String): Seq[StatusPoint] = {
    val d = dInt(date)
    val out = new Array[StatusPoint](metaSyms.length)
    var i = 0
    while (i < metaSyms.length) {
      val s = metaSyms(i)
      val cols = barsBySym.get(s)
      val hasBar = cols != null &&
        java.util.Arrays.binarySearch(cols.dates, d) >= 0
      out(i) = StatusPoint(s,
        isHalt = !hasBar && d <= metaDelisted(i),
        isDelisted = d > metaDelisted(i))
      i += 1
    }
    out.toSeq
  }

  /** The halted slice of [[stockStatus]] (the bench's third shape). */
  def haltedOn(date: String): Seq[StatusPoint] =
    stockStatus(date).filter(_.isHalt)
}

object PointServe {

  /** Column-major per-symbol bar history, date-sorted (primitive arrays —
    * no per-row objects in the resident index). */
  final class BarsCol(n: Int) {
    val dates = new Array[Int](n)
    val open = new Array[Double](n)
    val high = new Array[Double](n)
    val low = new Array[Double](n)
    val close = new Array[Double](n)
    val volume = new Array[Double](n)
    val money = new Array[Double](n)
  }

  /** Per-symbol version-1 reports, publication-date-sorted. */
  final class FundCol(n: Int) {
    val publ = new Array[Int](n)
    val end = new Array[Int](n)
    val revenue = new Array[Double](n)
    val roe = new Array[Double](n)
  }

  final case class PricePoint(symbol: String, date: LocalDate, open: Double,
                              high: Double, low: Double, close: Double,
                              volume: Double, money: Double)
  final case class FundPoint(symbol: String, qdate: LocalDate,
                             endDate: Option[LocalDate], revenue: Option[Double],
                             roe: Option[Double], version: Option[Int])
  final case class StatusPoint(symbol: String, isHalt: Boolean,
                               isDelisted: Boolean)

  /** first index with a(i) >= key */
  private[api] def lowerBound(a: Array[Int], key: Int): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** first index with a(i) > key */
  private[api] def upperBound(a: Array[Int], key: Int): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def epoch(r: Row, i: Int): Int =
    r.getDate(i).toLocalDate.toEpochDay.toInt

  /** One loader pass over the published tables → resident indexes.
    * Three collect()s, each the serving slice by construction (the 100 TB
    * deployment points this at ITS symbol shard's files). */
  def load(tables: MarketTables): PointServe = {
    val bars = new java.util.HashMap[String, BarsCol]()
    val grouped = tables.bars
      .select("symbol", "date", "open", "high", "low", "close", "volume", "money")
      .collect().groupBy(_.getString(0))
    grouped.foreach { case (s, rows) =>
      val sorted = rows.sortBy(epoch(_, 1))
      val c = new BarsCol(sorted.length)
      var i = 0
      sorted.foreach { r =>
        c.dates(i) = epoch(r, 1)
        c.open(i) = r.getDouble(2); c.high(i) = r.getDouble(3)
        c.low(i) = r.getDouble(4); c.close(i) = r.getDouble(5)
        c.volume(i) = r.getDouble(6); c.money(i) = r.getDouble(7)
        i += 1
      }
      bars.put(s, c)
    }
    val funds = new java.util.HashMap[String, FundCol]()
    tables.fundamentalsAll.filter(col("version") === 1)
      .select("symbol", "publ_date", "end_date", "revenue", "roe")
      .collect().groupBy(_.getString(0))
      .foreach { case (s, rows) =>
        // Explicit total order (ADVICE r13): (publ_date, end_date) — not
        // collect() insertion order, which is partition-order-dependent.
        // The fixtures have no (symbol, publ_date) ties among version-1
        // reports (FixtureContractSpec pins that), so this matches the
        // DataFrame as-of lane; if a regeneration ever introduces ties,
        // the contract spec fails loudly instead of the two serving
        // tiers silently diverging.
        val sorted = rows.sortBy(r => (epoch(r, 1), epoch(r, 2)))
        val c = new FundCol(sorted.length)
        var i = 0
        sorted.foreach { r =>
          c.publ(i) = epoch(r, 1); c.end(i) = epoch(r, 2)
          c.revenue(i) = r.getDouble(3); c.roe(i) = r.getDouble(4)
          i += 1
        }
        funds.put(s, c)
      }
    val meta = tables.stockMetadata
      .select("symbol", "de_listed_date").collect()
      .sortBy(_.getString(0))
    new PointServe(bars, funds,
      meta.map(_.getString(0)),
      meta.map(epoch(_, 1)))
  }
}
