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

/** Gate wiring: projections / filters / conversions (split from SparkEntry, r16). */
private[graft] trait ShapeQueriesPart extends EntryShared {

  // ------------------------------------------------- projections / filters / fns
  protected val shapeQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // P2 routed split-projection + P3 rename map ("amount→money" analogue).
    "p2_routed_split" -> ((s, dir) => {
      val routes = Map(
        "market" -> (Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"),
          Map("l_extendedprice" -> "money", "l_quantity" -> "volume")))
      Projections.routedSplit(TestData(s, dir).lineitem, routes)("market")
    }),

    // Wide→long unpivot (pandas melt): OHLC columns to (field, value)
    // rows — builtin Dataset.unpivot (a Generate, row-local, no shuffle).
    "p4_unpivot" -> ((s, dir) => {
      TestData(s, dir).lineitem
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_quantity")),
          "field", "value")
    }),

    // F6 column reorder/ensure with typed-null backfill (pandas reindex).
    "f6_reindex" -> ((s, dir) => {
      Projections.reindexColumns(
        TestData(s, dir).orders.select("o_orderkey", "o_totalprice"),
        Seq("o_orderkey", "o_totalprice", "total_shares", "float_value"))
    }),

    // F1/F5 status-flag predicates and labels (string-flag compare, C6).
    "f5_status_flags" -> ((s, dir) => {
      TestData(s, dir).orders
        .filter(col("o_orderstatus") =!= "P")
        .select(col("o_orderkey"),
          (col("o_orderstatus") === "F").as("is_filled"),
          when(col("o_orderstatus") === "O", lit("open")).otherwise(lit("other")).as("status_label"))
    }),

    // C1 code conversion round-trip + F2 index predicate — pure column exprs.
    "c1_code_roundtrip" -> ((s, dir) => {
      val bare = lpad((col("c_custkey") % 1000000).cast("string"), 6, "0")
      TestData(s, dir).customer
        .select(col("c_custkey"), CodeConvert.inferPtrade(bare).as("pt"))
        .withColumn("bs", CodeConvert.ptradeToBaostock(col("pt")))
        .withColumn("back", CodeConvert.baostockToPtrade(col("bs")))
        .withColumn("is_index", CodeConvert.isIndexCode(col("bs")))
    }),

    // C2 date parse/format family: date↔int YYYYMMDD, month truncation.
    "c2_dates" -> ((s, dir) => {
      TestData(s, dir).orders.select(
        col("o_orderkey"),
        Coerce.dateToInt(col("o_orderdate")).as("date_int"),
        Coerce.normalize(col("o_orderdate")).as("date_back"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month_start"))
    }),
  )
}
