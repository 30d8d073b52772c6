package graft

import org.apache.spark.sql.functions._
import graft.domain.MarketViews
import graft.functions.AggExpressions
import graft.ops.Aggregates

/** MinMaxByPair: identical semantics to struct-ordered min_by/max_by, but
  * hash-aggregable — asserts both the values and the physical plan. */
class AggExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("pair ordering matches struct-ordered builtin min_by/max_by on ties") {
    // seq ties within group 1 — px breaks them; group 2 single row
    val df = Seq(
      (1, 5L, 3.0), (1, 5L, 1.0), (1, 7L, 9.0), (1, 4L, 2.0),
      (2, 1L, 8.0)).toDF("g", "seq", "px")
    val pair = df.groupBy("g").agg(
        AggExpressions.minByPair(col("px"), col("seq"), col("px")).as("open"),
        AggExpressions.maxByPair(col("px"), col("seq"), col("px")).as("close"))
      .as[(Int, Double, Double)].collect().toSet
    val struct_ = df.groupBy("g").agg(
        min_by(col("px"), struct(col("seq"), col("px"))).as("open"),
        max_by(col("px"), struct(col("seq"), col("px"))).as("close"))
      .as[(Int, Double, Double)].collect().toSet
    assert(pair === struct_)
    assert(pair === Set((1, 2.0, 9.0), (2, 8.0, 8.0)))
  }

  test("pair ordering is partitioning-independent (merge path exercised)") {
    val rows = (1 to 500).map(i => (i % 7, (i * 31 % 50).toLong, (i * 17 % 90) / 4.0))
    val one = rows.toDF("g", "seq", "px").coalesce(1)
    val many = rows.toDF("g", "seq", "px").repartition(13)
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy("g").agg(
        AggExpressions.minByPair(col("px"), col("seq"), col("px")).as("o"),
        AggExpressions.maxByPair(col("px"), col("seq"), col("px")).as("c"))
      .as[(Int, Double, Double)].collect().toSet
    assert(agg(one) === agg(many))
  }

  test("bars derivation plans as HashAggregate, not SortAggregate") {
    val plan = MarketViews(spark, sf0001).bars.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected HashAggregate in:\n$plan")
    assert(!plan.contains("SortAggregate"), s"SortAggregate regressed:\n$plan")
  }

  test("resampleBars pair path equals the previous struct formulation on ticks") {
    val ticks = MarketViews(spark, sf0001).ticks
    val now = Aggregates.resampleBars(ticks, Seq(col("symbol")), col("date"),
        Seq(col("seq"), col("px")), col("px"),
        col("qty").cast("decimal(25,6)"), col("amt").cast("decimal(25,6)"))
      .select("symbol", "period", "open", "close")
    val before = ticks.groupBy(col("symbol"), col("date").as("period")).agg(
        min_by(col("px"), struct(col("seq"), col("px"))).as("open"),
        max_by(col("px"), struct(col("seq"), col("px"))).as("close"))
      .select("symbol", "period", "open", "close")
    assert(now.exceptAll(before).isEmpty && before.exceptAll(now).isEmpty)
  }
}
