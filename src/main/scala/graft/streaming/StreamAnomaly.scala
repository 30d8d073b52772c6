package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window z-score anomaly alerts — the online twin of
  * `ops/Windows.rollingZscore` (same fixed IEEE tree, same division-free
  * verdict), as a `flatMapGroupsWithState` per-key state machine.
  *
  * Scale posture: state is the last `n−1` values per key — O(active keys ·
  * n), independent of stream length; an event-time timeout evicts keys
  * idle past `horizonMs`, so a churning key population can't accumulate
  * state. Every event emits exactly one alert row in the batch that
  * processes it (append-safe: no retraction, no watermark-gated emission).
  *
  * Determinism contract: events are sorted (ts, event_id) per key per
  * micro-batch before folding — within a batch, arrival order doesn't
  * matter. Across batches the frame follows processing order (standard
  * stateful-op semantics); disorder beyond the watermark is the
  * deployment's responsibility, and the one-batch oracle replay is exactly
  * the batch window query.
  *
  * The frame sums are sequential folds in frame order and the z/verdict
  * trees match [[graft.ops.Windows.rollingZscore]] verbatim, so the DuckDB
  * oracle replays alerts bit-for-bit.
  */
object StreamAnomaly {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  /** Trailing ≤ n−1 values (frame order) + last event-time for eviction. */
  case class Tail(lastMs: Long, values: Seq[Double])
  case class Alert(user_id: Long, event_id: Long, n_frame: Long,
                   z: Option[Double], outlier: Boolean)

  def zscores(events: Dataset[Event], n: Int, k: Double,
              horizonMs: Long = 24L * 3600 * 1000): Dataset[Alert] = {
    implicit val alertEnc = Encoders.product[Alert]
    implicit val tailEnc = Encoders.product[Tail]
    implicit val longEnc = Encoders.scalaLong
    val kk = k * k
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Tail, Alert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Tail]) =>
          if (state.hasTimedOut) {
            // idle past the horizon: evict; alerts were already emitted
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var tail = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
            var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
            val out = sorted.map { e =>
              val frame = tail :+ e.value
              var sx = 0.0; var sxx = 0.0
              frame.foreach { v => sx += v; sxx += v * v } // sequential fold
              val nn = frame.length.toDouble
              val dev = e.value * nn - sx
              val varN2 = nn * sxx - sx * sx
              val z = if (varN2 > 0) Some(dev / math.sqrt(varN2)) else None
              val outlier = varN2 > 0 && dev * dev > kk * varN2
              tail = frame.takeRight(n - 1)
              lastMs = math.max(lastMs, e.ts.getTime)
              Alert(userId, e.event_id, frame.length.toLong, z, outlier)
            }
            if (out.nonEmpty) {
              state.update(Tail(lastMs, tail))
              state.setTimeoutTimestamp(lastMs + horizonMs)
            }
            out.iterator
          }
      }
  }
}
