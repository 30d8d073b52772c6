package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation-family operators (SURVEY.md §2.4 A1–A6). */
object Aggregates {

  /** A6 — OHLCV bar synthesis from finer-grained rows: per (key, period)
    * first/max/min/last/sum. Reference: weekly/monthly bars "由日线数据进行合成"
    * (PTrade_API_mini_Reference.md:1983).
    *
    * `order` (1 or 2 columns, lexicographic) must be unique-or-
    * interchangeable within (key, period) for deterministic open/close.
    * A single order column uses builtin min_by/max_by; a pair uses
    * [[graft.functions.MinMaxByPair]] — the struct-ordered builtin would
    * put a struct in the aggregation buffer and force SortAggregate, while
    * the flattened pair keeps the whole groupBy in HashAggregate +
    * whole-stage codegen (single-pass partial agg, no window shuffle
    * beyond the groupBy).
    */
  def resampleBars(df: DataFrame, keys: Seq[Column], period: Column, order: Seq[Column],
                   price: Column, volume: Column, money: Column): DataFrame = {
    val (openAgg, closeAgg) = order match {
      case Seq(o) => (min_by(price, o), max_by(price, o))
      case Seq(o1, o2) => (graft.functions.AggExpressions.minByPair(price, o1, o2),
        graft.functions.AggExpressions.maxByPair(price, o1, o2))
      case _ => throw new IllegalArgumentException(
        s"resampleBars supports 1 or 2 order columns, got ${order.length}")
    }
    df.groupBy((keys :+ period.as("period")): _*).agg(
      openAgg.as("open"),
      max(price).as("high"),
      min(price).as("low"),
      closeAgg.as("close"),
      sum(volume).as("volume"),
      sum(money).as("money"),
      count(lit(1)).as("n_rows"))
  }

  /** A5 — cumulative product per key via the log-sum trick
    * (adjust-factor synthesis, docs/DATA_MAPPING.md:533-575). Requires
    * strictly positive factors (true for price-adjustment ratios).
    * exp(sum(log x)) keeps the whole computation inside whole-stage codegen;
    * an exact `Aggregator` variant is only warranted if precision tests fail
    * (SURVEY.md §7.3).
    */
  def cumProduct(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 factor: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(as, exp(sum(log(factor)).over(w)))
  }

  /** A5 exact variant — cumulative product as a sequential left fold over
    * the ordered factor prefix (`aggregate(collect_list(...) over w)`).
    * Bit-deterministic (same multiply sequence on any engine). The r12
    * formulation (`aggregate(collect_list(factor).over(unboundedPreceding),
    * 1.0, _*_)`) materialized EVERY row's full prefix — O(n²) memory per
    * key in history length n; this one groups the key's history once and
    * runs the O(n) [[graft.functions.CumProdRun]] codegen pass (identical
    * multiply sequence incl. the 1.0 init and collect_list's null-skipping,
    * so results are bit-for-bit). History axis measured LINEAR in
    * docs/SCALEHIST_r13.json. `order` should be unique per key (the packed
    * sort breaks residual ties on (factor, full row) deterministically). */
  def cumProductExact(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                      factor: Column, as: String): DataFrame = {
    val orderFields = order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }
    val packed = struct(
      (orderFields :+ factor.as("__f")) :+
        struct(df.columns.map(col): _*).as("__r"): _*)
    df.groupBy(keys: _*).agg(sort_array(collect_list(packed)).as("__xs"))
      .withColumn("__run", graft.functions.SeqFoldExpressions.cumProdRun(
        transform(col("__xs"), x => x.getField("__f"))))
      .select(posexplode(arrays_zip(col("__xs"), col("__run"))).as(Seq("__p", "__z")))
      .select(col("__z.__xs.__r.*"), col("__z.__run").as(as))
  }

  /** A1 — distinct-union accumulation: union of key scans → sorted distinct
    * pool (download_efficient.py:252-273). */
  def distinctUnion(frames: Seq[DataFrame]): DataFrame =
    frames.reduce(_ unionByName _).distinct()
}
