package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The TYPED `Aggregator[IN, BUF, OUT]` rung of the custom-aggregation
  * ladder (Expression+codegen: `VecDotFloat`; DeclarativeAggregate:
  * [[MinMaxByPair]]; rewrite Rule: `GraftExtensions`; whole operator:
  * `AsOfJoinExec` — this adds the Dataset-typed API a case-class pipeline
  * author reaches for first). An `Aggregator` runs as an
  * ObjectHashAggregate with Encoder-serialized buffers: slower per row
  * than the Declarative form (no whole-stage codegen through the merge),
  * but it composes with `Dataset[T].groupByKey.agg(agg.toColumn)` with
  * compile-time types end to end, and the buffer can be an arbitrary
  * case class — things the Expression forms can't offer. The engine
  * provides BOTH: Declarative where the hot path lives (bars), typed
  * where ergonomics matter (user-defined pipelines).
  *
  * Determinism contract (same rules as everywhere): order-sensitive
  * picks (open/close) resolve through a TOTAL order carried in the
  * buffer; money sums ride scaled BIGINTs (micros) so merge order can't
  * drift a float. */
object TypedAggregators {

  /** One tick: event-time (ns), a total-order tiebreaker, price, size. */
  case class Tick(tsNs: Long, seq: Long, px: Double, qty: Long)

  /** OHLCV buffer: first/last resolve by (tsNs, seq); turnover in
    * price-micros·qty so the sum is exact integer arithmetic. */
  case class BarBuf(firstTs: Long, firstSeq: Long, open: Double,
                    lastTs: Long, lastSeq: Long, close: Double,
                    high: Double, low: Double,
                    volume: Long, turnoverMicros: Long, nTicks: Long)

  case class Bar(open: Double, high: Double, low: Double, close: Double,
                 volume: Long, turnover_micros: Long, n_ticks: Long)

  /** Typed OHLCV bar aggregator — semantically the [[MinMaxByPair]] bars
    * derivation, expressed in the typed API. */
  object OhlcvAgg extends Aggregator[Tick, BarBuf, Bar] {
    private def earlier(aTs: Long, aSeq: Long, bTs: Long, bSeq: Long): Boolean =
      aTs < bTs || (aTs == bTs && aSeq < bSeq)

    def zero: BarBuf =
      BarBuf(Long.MaxValue, Long.MaxValue, 0.0, Long.MinValue, Long.MinValue,
        0.0, Double.NegativeInfinity, Double.PositiveInfinity, 0L, 0L, 0L)

    def reduce(b: BarBuf, t: Tick): BarBuf = {
      val micros = math.round(t.px * 1e6) * t.qty
      BarBuf(
        if (earlier(t.tsNs, t.seq, b.firstTs, b.firstSeq)) t.tsNs else b.firstTs,
        if (earlier(t.tsNs, t.seq, b.firstTs, b.firstSeq)) t.seq else b.firstSeq,
        if (earlier(t.tsNs, t.seq, b.firstTs, b.firstSeq)) t.px else b.open,
        if (earlier(b.lastTs, b.lastSeq, t.tsNs, t.seq)) t.tsNs else b.lastTs,
        if (earlier(b.lastTs, b.lastSeq, t.tsNs, t.seq)) t.seq else b.lastSeq,
        if (earlier(b.lastTs, b.lastSeq, t.tsNs, t.seq)) t.px else b.close,
        math.max(b.high, t.px), math.min(b.low, t.px),
        b.volume + t.qty, b.turnoverMicros + micros, b.nTicks + 1L)
    }

    def merge(a: BarBuf, b: BarBuf): BarBuf =
      if (b.nTicks == 0L) a
      else if (a.nTicks == 0L) b
      else BarBuf(
        if (earlier(a.firstTs, a.firstSeq, b.firstTs, b.firstSeq)) a.firstTs else b.firstTs,
        if (earlier(a.firstTs, a.firstSeq, b.firstTs, b.firstSeq)) a.firstSeq else b.firstSeq,
        if (earlier(a.firstTs, a.firstSeq, b.firstTs, b.firstSeq)) a.open else b.open,
        if (earlier(b.lastTs, b.lastSeq, a.lastTs, a.lastSeq)) a.lastTs else b.lastTs,
        if (earlier(b.lastTs, b.lastSeq, a.lastTs, a.lastSeq)) a.lastSeq else b.lastSeq,
        if (earlier(b.lastTs, b.lastSeq, a.lastTs, a.lastSeq)) a.close else b.close,
        math.max(a.high, b.high), math.min(a.low, b.low),
        a.volume + b.volume, a.turnoverMicros + b.turnoverMicros,
        a.nTicks + b.nTicks)

    def finish(b: BarBuf): Bar =
      Bar(b.open, b.high, b.low, b.close, b.volume, b.turnoverMicros, b.nTicks)

    def bufferEncoder: Encoder[BarBuf] = Encoders.product[BarBuf]
    def outputEncoder: Encoder[Bar] = Encoders.product[Bar]
  }
}
