package graft

import org.apache.spark.sql.functions._
import graft.api.PTradeApi
import graft.domain.MarketViews

/** Serving-surface behavior tests, incl. the SURVEY §7.4 risk register:
  * point-in-time correctness (no future leakage), suspension fill
  * semantics, and edge shapes. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val views = MarketViews(spark, sf0001)
  private lazy val api = PTradeApi(views)
  private val syms = Seq("000001.SZ", "000002.SZ", "000003.SZ")

  test("fundamentals as-of NEVER leaks a report published after the query date") {
    val qdates = views.calendar.groupBy(year(col("trade_date")))
      .agg(min(col("trade_date")).as("qdate")).select("qdate")
    val out = api.getFundamentalsAsOf(syms, qdates)
    // join back to publication dates and assert publ_date <= qdate for all hits
    val leaks = out.filter(col("end_date").isNotNull)
      .join(views.fundamentals.select("symbol", "end_date", "publ_date"), Seq("symbol", "end_date"))
      .filter(col("publ_date") > col("qdate"))
      .count()
    assert(leaks == 0)
    // and the earliest query dates (before any publication) return null
    assert(out.filter(col("end_date").isNull).count() > 0)
  }

  test("fundamentals as-of picks the LATEST publication at or before the date") {
    val qdates = Seq("1999-01-04").toDF("q").select(to_date(col("q")).as("qdate"))
    val out = api.getFundamentalsAsOf(Seq("000001.SZ"), qdates).head()
    val expected = views.fundamentals
      .filter(col("symbol") === "000001.SZ" && col("publ_date") <= lit("1999-01-04"))
      .orderBy(col("publ_date").desc).select("end_date").head()
    assert(out.getAs[java.sql.Date]("end_date") == expected.getAs[java.sql.Date]("end_date"))
  }

  test("getHistory fills suspended days with last close and volume 0") {
    val h = api.getHistory(1000, syms, "2001-12-31")
    // spine covers every calendar day in each symbol's lifetime: closes all
    // non-null after the first bar, volume never null
    assert(h.filter(col("volume").isNull).count() == 0)
    val filledDays = h.filter(col("volume") === 0.0)
    if (filledDays.count() > 0) {
      assert(filledDays.filter(col("close").isNull).count() == 0,
        "suspended days must carry a forward-filled close")
    }
  }

  test("getPrice post-adjustment only rescales prices (volume unchanged)") {
    val raw = api.getPrice(syms, "1996-01-01", "1996-12-31", Seq("close", "volume"))
    val adj = api.getPrice(syms, "1996-01-01", "1996-12-31", Seq("close", "volume"), fq = "post")
    val j = raw.withColumnRenamed("close", "c0").withColumnRenamed("volume", "v0")
      .join(adj, Seq("symbol", "date"))
    assert(j.filter(col("v0") =!= col("volume")).count() == 0)
    assert(j.filter(col("c0") === col("close")).count() < j.count(),
      "adjustment must actually change some prices")
  }

  test("matrix edge shape is date x security with one column per symbol") {
    val long = api.getPrice(syms, "1996-01-01", "1996-06-30", Seq("close"))
    val m = api.toMatrix(long, "close", syms)
    assert(m.columns.toSeq == ("date" +: syms))
  }

  test("industry dimension: every listed stock gets exactly one block, JSON matches") {
    val uni = api.getAshares("1997-03-03").select("symbol").as[String].collect().toSeq
    val blocks = api.getStockBlocks(uni)
    assert(blocks.count() == uni.size, "one industry row per security")
    assert(blocks.filter(col("industry").isNull).count() == 0)
    assert(blocks.filter(col("industry_classification") =!= "sws_l1").count() == 0)
    // metadata blocks JSON round-trips through from_json to the same fields
    val meta = views.stockMetadata.select(col("symbol"),
      from_json(col("blocks"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "industry STRING, industryClassification STRING")).as("b"))
    val mismatch = meta.join(blocks, "symbol")
      .filter(col("b.industry") =!= col("industry") ||
        col("b.industryClassification") =!= col("industry_classification"))
    assert(mismatch.count() == 0)
  }

  test("getIndeces returns index codes only, disjoint from the A-share universe") {
    val idx = api.getIndeces("1998-06-30").as[String].collect().toSet
    assert(idx == Set("000300.SS", "000905.SS", "000016.SS"))
    val ashares = api.getAshares("1997-03-03").select("symbol").as[String].collect().toSet
    assert(idx.intersect(ashares).isEmpty)
  }

  test("getAllTradeDays aliases getTradeDays (same rows)") {
    val a = api.getAllTradeDays("1996-01-01", "1996-12-31")
    val b = api.getTradeDays("1996-01-01", "1996-12-31")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("getIndexStocks partitions the universe disjointly across indices") {
    val a = api.getIndexStocks("000300.SS", "1998-06-30").as[String].collect().toSet
    val b = api.getIndexStocks("000905.SS", "1998-06-30").as[String].collect().toSet
    assert(a.nonEmpty && b.nonEmpty)
    assert(a.intersect(b).isEmpty)
  }
}
