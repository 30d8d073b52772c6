package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING one-sided CUSUM — the change-point monitor run against live
  * keyed streams (the batch twin is [[graft.ops.Windows.cusum]], same
  * recursion: sₜ = max(0, sₜ₋₁ + xₜ), alarm when sₜ > h). State per key
  * is ONE double + the last event-time — O(1), the smallest possible
  * stateful operator, which is exactly why CUSUM is the streaming
  * change-point statistic of choice at 10⁹ keys (a windowed z-score
  * carries a frame; this carries a scalar).
  *
  * In-batch events fold in (event-time, event_id) order (the batch twin's
  * order contract), so a one-batch replay is bit-identical to the batch
  * operator — `stream_cusum` shares semantics with `w16_cusum`'s oracle
  * family. Idle keys evict via event-time timeout after `horizonMs`.
  */
object StreamCusum {

  case class Obs(user_id: Long, event_id: Long, ts: Timestamp, x: Double)
  case class CusumState(lastMs: Long, s: Double)
  case class Point(user_id: Long, event_id: Long, cusum: Double, alarm: Boolean)

  def cusum(events: Dataset[Obs], h: Double,
            horizonMs: Long = 24L * 3600 * 1000): Dataset[Point] = {
    implicit val pointEnc = Encoders.product[Point]
    implicit val stateEnc = Encoders.product[CusumState]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, Point](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Obs], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.map(_.s).getOrElse(0.0)
            var lastMs = state.getOption.map(_.lastMs).getOrElse(0L)
            val out = sorted.map { e =>
              s = s + e.x
              if (s < 0.0) s = 0.0
              lastMs = math.max(lastMs, e.ts.getTime)
              Point(userId, e.event_id, s, s > h)
            }
            if (out.nonEmpty) {
              state.update(CusumState(lastMs, s))
              state.setTimeoutTimestamp(lastMs + horizonMs)
            }
            out.iterator
          }
      }
  }
}
