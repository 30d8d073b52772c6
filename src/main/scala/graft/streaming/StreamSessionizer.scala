package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with CUSTOM state —
  * `flatMapGroupsWithState` over a `KeyValueGroupedDataset` (SURVEY §2.9
  * custom-state extension; batch analogue `ops/Windows.sessionize`).
  *
  * Built-in `session_window` could fold sessions too, but it (a) splits at
  * exactly the gap (half-open window) where the batch operator extends
  * (strict `>`), and (b) cannot carry bespoke accumulator state. Custom
  * state matches the batch semantics exactly and shows the shape any
  * richer per-key state machine (position tracking, online features) takes.
  *
  * Scale posture: state is ONE open session per active key — O(active keys),
  * not O(events); the event-time timeout closes and evicts state as the
  * watermark passes `last_ts + gap`, so idle keys don't accumulate.
  *
  * Contract: per-key ts order within a micro-batch is NOT assumed (the
  * iterator is sorted per invocation — bounded by the key's batch volume).
  * Rows behind the watermark are dropped by the engine before the operator
  * (standard stateful-op late-data semantics); choose the watermark delay
  * to cover expected disorder.
  */
object StreamSessionizer {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
                     n_events: Long, session_value: Double)

  /** Append-mode closed sessions from a watermarked event stream. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last_ts + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.startMs, s.lastMs, s.n, s.sum))
          } else {
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.value))
            val closed = Vector.newBuilder[Session]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastMs > gapMs =>
                  closed += Session(userId, s.startMs, s.lastMs, s.n, s.sum)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(OpenSession(s.startMs, math.max(s.lastMs, t),
                    s.n + 1, s.sum + e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when the watermark passes the gap after the last event
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
