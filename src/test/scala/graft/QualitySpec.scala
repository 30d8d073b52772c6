package graft

import org.apache.spark.sql.functions._
import graft.api.PTradeApi
import graft.domain.MarketViews
import graft.quality.DataQuality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val views = MarketViews(spark, sf0001)

  test("derived bars satisfy the §5.4 invariants by construction") {
    val inv = DataQuality.barInvariants(views.bars, views.calendar).cache()
    val s = DataQuality.summarize(inv).head()
    assert(s.getAs[Long]("null_ohlc") == 0)
    assert(s.getAs[Long]("lo_gt_hi") == 0)
    assert(s.getAs[Long]("ooh_range") == 0)
    assert(s.getAs[Long]("nonpos_volume") == 0)
    // calendar gaps are expected (symbols don't trade every day) but never negative
    assert(inv.filter(col("calendar_gaps") < 0).count() == 0)
  }

  test("null profile counts missing values per column") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)), (Some(3.0), Some(4.0)))
      .toDF("a", "b")
    val p = DataQuality.nullProfile(df, Seq("a", "b")).head()
    assert(p.getAs[Long]("n_rows") == 3)
    assert(p.getAs[Long]("a_nulls") == 1)
    assert(p.getAs[Long]("b_nulls") == 1)
  }

  test("pivot (matrix edge) round-trips back to the long shape") {
    val api = PTradeApi(views)
    val syms = Seq("000001.SZ", "000002.SZ", "000003.SZ")
    val long = api.getPrice(syms, "1996-01-01", "1996-06-30", Seq("close"))
    val m = api.toMatrix(long, "close", syms)
    // unpivot: stack the symbol columns back into (date, symbol, close)
    val back = m.selectExpr("date",
        s"stack(${syms.length}, ${syms.map(s => s"'$s', `$s`").mkString(", ")}) AS (symbol, close)")
      .filter(col("close").isNotNull)
    assert(back.select("date", "symbol", "close").exceptAll(long.select("date", "symbol", "close")).isEmpty)
    assert(long.select("date", "symbol", "close").exceptAll(back.select("date", "symbol", "close")).isEmpty)
  }
}
