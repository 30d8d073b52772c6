package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING token-bucket rate limiter — the per-key quota/throttle
  * verdict computed ON the live stream (batch twin:
  * [[graft.ops.Windows.tokenBucket]], identical all-integer recursion):
  * a key's bucket starts FULL at `capMt` milli-tokens, refills
  * `refillPerMs` mtokens per elapsed event-time ms (clamped at capMt),
  * an event is ALLOWED iff the refilled level covers its cost, and
  * denied events leave the level untouched (strict policing — the shape
  * API gateways and ingestion quotas run at 10⁹ keys, because state per
  * key is two longs).
  *
  * In-batch events fold in (event-time ms, event_id) order — the batch
  * twin's order contract — so a one-batch replay is bit-identical to
  * [[graft.ops.Windows.tokenBucket]] and the gate shares its oracle.
  * Idle keys evict via event-time timeout after `horizonMs`.
  */
object StreamRateLimit {

  case class Req(user_id: Long, event_id: Long, ts: Timestamp, cost_mt: Long)
  case class BucketState(lastMs: Long, tokensMt: Long)
  case class Verdict(user_id: Long, event_id: Long, allowed: Boolean,
                     tokens_mt: Long)

  def rateLimit(reqs: Dataset[Req], capMt: Long, refillPerMs: Long,
                horizonMs: Long = 24L * 3600 * 1000): Dataset[Verdict] = {
    implicit val outEnc = Encoders.product[Verdict]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val longEnc = Encoders.scalaLong
    reqs.groupByKey(_.user_id)
      .flatMapGroupsWithState[BucketState, Verdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Req], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.map(_.tokensMt).getOrElse(capMt)
            var tPrev = state.getOption.map(_.lastMs).getOrElse(Long.MinValue)
            val out = sorted.map { e =>
              val t = e.ts.getTime
              if (tPrev != Long.MinValue && t > tPrev)
                s = math.min(capMt, s + (t - tPrev) * refillPerMs)
              tPrev = t
              val allowed = s >= e.cost_mt
              if (allowed) s -= e.cost_mt
              Verdict(userId, e.event_id, allowed, s)
            }
            if (out.nonEmpty) {
              state.update(BucketState(tPrev, s))
              state.setTimeoutTimestamp(tPrev + horizonMs)
            }
            out.iterator
          }
      }
  }
}
