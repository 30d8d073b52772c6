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

  test("typed OhlcvAgg: hand bar, merge-order invariance, empty-side merge") {
    import graft.functions.TypedAggregators._
    val ticks = Seq(
      Tick(30L, 3L, 7.0, 2L), Tick(10L, 1L, 5.0, 1L),
      Tick(10L, 2L, 9.0, 4L), Tick(20L, 9L, 1.0, 3L))
    // open = px at (10,1)=5, close = px at (30,3)=7, high 9, low 1,
    // vol 10, turnover = (7e6·2)+(5e6·1)+(9e6·4)+(1e6·3) = 58e6
    val want = Bar(5.0, 9.0, 1.0, 7.0, 10L, 58000000L, 4L)
    // every permutation and every split point must produce the same bar
    ticks.permutations.take(12).foreach { perm =>
      (0 to perm.length).foreach { cut =>
        val (l, r) = perm.splitAt(cut)
        val got = OhlcvAgg.finish(OhlcvAgg.merge(
          l.foldLeft(OhlcvAgg.zero)(OhlcvAgg.reduce),
          r.foldLeft(OhlcvAgg.zero)(OhlcvAgg.reduce)))
        assert(got === want, s"perm=$perm cut=$cut")
      }
    }
  }

  test("typed OhlcvAgg through groupByKey matches the SQL window derivation") {
    val ev = sources.TestData(spark, sf0001).events
    val ticks = ev.select(
        concat(lit("S"), col("user_id") % 5).as("symbol"),
        col("ts_ns").as("tsNs"), col("event_id").as("seq"),
        ((col("event_id") * 37) % 100).cast("double").as("px"),
        ((col("event_id") % 10) + 1).as("qty"))
      .as[(String, Long, Long, Double, Long)]
    import graft.functions.TypedAggregators._
    val typed = ticks.groupByKey(_._1)
      .mapValues { case (_, ts, seq, px, qty) => Tick(ts, seq, px, qty) }
      .agg(OhlcvAgg.toColumn)
      .map { case (s, b) => (s, b.open, b.close, b.volume, b.n_ticks) }
      .collect().toSet
    val sql = ticks.toDF("symbol", "tsNs", "seq", "px", "qty")
      .groupBy("symbol").agg(
        min_by(col("px"), struct(col("tsNs"), col("seq"))).as("open"),
        max_by(col("px"), struct(col("tsNs"), col("seq"))).as("close"),
        sum("qty").as("volume"), count(lit(1)).as("n"))
      .as[(String, Double, Double, Long, Long)].collect().toSet
    assert(typed === sql)
  }

  test("TopKByScore ≡ the row_number window under ties, partial-merge invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // deterministic candidate set with deliberate score TIES (score is a
    // coarse bucket) so the dst-ASC tiebreak is exercised, and enough rows
    // per group that map-side partials must merge
    val rows = for {
      g <- 0L until 7L
      i <- 0L until 400L
    } yield (g, (g * 997 + i * 131) % 1000, ((i * 37) % 11).toDouble / 10.0)
    val df = rows.toDF("src", "dst", "score")
      .repartition(8) // force multi-partition partial aggregation
    val k = 5
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("score").desc, col("dst").asc)))
      .filter(col("rn") <= k)
      .select("src", "dst", "score")
      .as[(Long, Long, Double)].collect().toSet
    val viaAgg = df.groupBy("src")
      .agg(graft.functions.TopKByScore.topK(col("dst"), col("score"), k).as("nb"))
      .select(col("src"), explode(col("nb")).as("e"))
      .select(col("src"), col("e.dst"), col("e.score"))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg === viaWindow, "top-k aggregate must select the window's rows")
    // duplicate (dst, score) rows: the window emits BOTH copies inside k —
    // the aggregate does too (insertion has no dedup; callers emit each
    // pair once, which is what keeps the two formulations equal)
    val dup = Seq((1L, 5L, 1.0), (1L, 5L, 1.0), (1L, 6L, 0.5)).toDF("src", "dst", "score")
    val got = dup.groupBy("src")
      .agg(graft.functions.TopKByScore.topK(col("dst"), col("score"), 2).as("nb"))
      .select(explode(col("nb")).as("e")).select(col("e.dst"), col("e.score"))
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((5L, 1.0), (5L, 1.0)))
  }
}
