package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.BarBuilder

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  case class Tick(symbol: String, ts: Timestamp, px: Double, qty: Double)

  private def t(s: String) = Timestamp.valueOf(s)

  test("BarBuilder folds a tick stream into OHLCV bars with watermark state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val query = BarBuilder.bars(input.toDF(), windowLen = "1 hour", lateness = "0 seconds")
      .writeStream.format("memory").queryName("bars_out")
      .outputMode("append").start()
    try {
      input.addData(
        Tick("A", t("2024-01-01 09:00:01"), 10.0, 1.0),
        Tick("A", t("2024-01-01 09:10:00"), 12.0, 2.0),
        Tick("A", t("2024-01-01 09:50:00"), 8.0, 1.0),
        Tick("B", t("2024-01-01 09:30:00"), 100.0, 5.0))
      query.processAllAvailable()
      // advance the watermark past the 09:00 window so it closes
      input.addData(Tick("A", t("2024-01-01 11:00:00"), 9.0, 1.0))
      query.processAllAvailable()
      val out = spark.table("bars_out")
        .select("symbol", "open", "high", "low", "close", "volume", "n_ticks")
        .as[(String, Double, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(out.contains(("A", 10.0, 12.0, 8.0, 8.0, 4.0, 3L)))
      assert(out.contains(("B", 100.0, 100.0, 100.0, 100.0, 5.0, 1L)))
    } finally query.stop()
  }

  case class SeqTick(symbol: String, ts: Timestamp, px: Double, qty: Double, seq: Long)

  test("BarBuilder same-timestamp ticks: seqCol breaks the open/close tie deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SeqTick]
    val query = BarBuilder.bars(input.toDF(), windowLen = "1 hour",
        lateness = "0 seconds", seqCol = Some("seq"))
      .writeStream.format("memory").queryName("bars_seq_out")
      .outputMode("append").start()
    try {
      // three ticks at the SAME timestamp - order must follow seq, not luck
      input.addData(
        SeqTick("A", t("2024-01-01 09:00:00"), 50.0, 1.0, 2L),
        SeqTick("A", t("2024-01-01 09:00:00"), 10.0, 1.0, 1L),
        SeqTick("A", t("2024-01-01 09:00:00"), 30.0, 1.0, 3L))
      query.processAllAvailable()
      input.addData(SeqTick("A", t("2024-01-01 11:00:00"), 9.0, 1.0, 4L))
      query.processAllAvailable()
      val out = spark.table("bars_seq_out")
        .select("open", "close").as[(Double, Double)].collect()
      assert(out.contains((10.0, 30.0)), s"open=first-seq, close=last-seq; got ${out.toSeq}")
    } finally query.stop()
  }

  test("incrementalRefresh upserts fresh bars over existing (last-wins)") {
    val existing = Seq(("A", t("2024-01-01 09:00:00"), 1.0), ("B", t("2024-01-01 09:00:00"), 2.0))
      .toDF("symbol", "bar_start", "close")
    val fresh = Seq(("B", t("2024-01-01 09:00:00"), 9.0))
      .toDF("symbol", "bar_start", "close")
    val out = BarBuilder.incrementalRefresh(existing, fresh)
      .select("symbol", "close").as[(String, Double)].collect().toSet
    assert(out == Set(("A", 1.0), ("B", 9.0)))
  }
}
