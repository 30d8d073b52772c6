package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.sources.SyntheticMarket

class SyntheticSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic generator is deterministic and schema-stable") {
    val g = SyntheticMarket(spark, seed = 7L, nSymbols = 20, nDays = 60)
    val a = g.unifiedDaily.orderBy("symbol", "date").collect()
    val b = SyntheticMarket(spark, seed = 7L, nSymbols = 20, nDays = 60)
      .unifiedDaily.orderBy("symbol", "date").collect()
    assert(a.toSeq == b.toSeq, "same seed ⇒ identical output")
    assert(a.length == 20 * 60)
    val c = SyntheticMarket(spark, seed = 8L, nSymbols = 20, nDays = 60)
      .unifiedDaily.orderBy("symbol", "date").collect()
    assert(a.toSeq != c.toSeq, "different seed ⇒ different data")
  }

  test("generator produces the fixture knobs: halts, ST flips, weekday calendar") {
    val g = SyntheticMarket(spark, seed = 42L, nSymbols = 50, nDays = 250)
    val df = g.unifiedDaily.cache()
    assert(df.filter(col("tradestatus") === "0").count() > 0, "some halted days")
    assert(df.filter(col("isST") === "1").count() > 0, "some ST days")
    assert(df.filter(col("tradestatus") === "0" && col("volume") =!= 0.0).count() == 0,
      "halted days have zero volume")
    val cal = g.calendar.select(dayofweek(col("trade_date"))).as[Int].collect()
    assert(cal.forall(d => d >= 2 && d <= 6), "weekday-only calendar")
  }

  test("P2 routed split shares one scan and renames per route") {
    val routes = SyntheticMarket(spark, nSymbols = 10, nDays = 20).split()
    assert(routes.keySet == Set("market", "valuation", "status"))
    assert(routes("valuation").columns.toSeq == Seq("symbol", "date", "pe_ttm", "pb"))
    assert(routes("market").count() == 10 * 20)
  }

  test("vec_dot is SQL-callable after registration") {
    VectorExpressions.register(spark)
    val out = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d")
      .as[Double].head()
    assert(out == 11.0)
  }
}
