package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq, Quant}
import graft.api.PTradeApi
import graft.dedup.Dedup
import graft.domain.MarketViews
import graft.functions.{CodeConvert, Coerce, TextFns, Tokenizer}
import graft.multimodal.{Bmp, Exif, Flac, Gif, H264Meta, H264Px, Ico, Jpeg, Mkv, Mp3Meta, Mp4Meta, Multimodal, Npy, Ogg, Pdf, Png, Srt, TarShard, Tiff, Ttf, Video, Webp, Zip}
import graft.ops.{Aggregates, Graph, Joins, Projections, Quantiles, Sampling, Sketches, Windows}
import graft.quality.{Chunker, DataQuality, Decontam, LangModel, Packer, Redact, Relevance}
import graft.sources.{Sinks, TestData}

/** Gate wiring: scans & core aggregation (split from SparkEntry, r16). */
private[graft] trait CoreQueriesPart extends EntryShared {

  // ---------------------------------------------------------------- scans & core
  protected val coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2 counters + headline aggregation (TPC-H Q1 shape).
    "q1_pricing_summary" -> ((s, dir) => {
      TestData(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Beyond-reference: hierarchical ROLLUP aggregation (free under
    // Catalyst; the reference has no grouping-sets capability at all).
    "rollup_revenue" -> ((s, dir) => {
      TestData(s, dir).orders
        .rollup(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderstatus"))
        .agg(decSum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // Beyond-reference: full CUBE grouping sets (all four (year, status)
    // marginal combinations in one pass — Catalyst's Expand feeds a single
    // aggregation, so the cube costs ONE shuffle, not 4 scans).
    "cube_revenue" -> ((s, dir) => {
      TestData(s, dir).orders
        .cube(year(col("o_orderdate")).cast("long").as("order_year"), col("o_orderstatus"))
        .agg(decSum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // Headline join+agg+topk (TPC-H Q3 shape). Decimal revenue → exact order.
    "q3_topk_revenue" -> ((s, dir) => {
      val t = TestData(s, dir)
      t.orders.filter(col("o_orderdate") < lit("1996-07-01"))
        .join(t.lineitem.filter(col("l_shipdate") > lit("1996-06-30")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // S1/S2 unified wide scan: projection + date normalize + JSON extract +
    // numeric coercion + boolean flag derivation (C2/C3/C4/C6).
    "s1_unified_scan" -> ((s, dir) => {
      TestData(s, dir).events.select(
        col("event_id"), col("user_id"),
        Coerce.normalize(col("ts")).as("date"),
        col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("k_value"),
        (col("event_type") === "error").as("is_error"))
    }),

    // F4 date-range predicate + P1 field-list projection (pushed to parquet).
    "f4_p1_range_scan" -> ((s, dir) => {
      TestData(s, dir).lineitem
        .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1996-03-31")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),
  )
}
