package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CDC apply — the tombstone-aware per-key state machine a
  * change-feed consumer runs (the streaming twin of the batch last-wins
  * upsert `ops/Joins.upsert`, with the piece batch can't express cheaply:
  * DELETE markers that RESET accumulated state mid-stream).
  *
  * Semantics per key, in (ts, seq) order: an `upsert` increments the
  * since-delete count and adds its value to the since-delete running sum;
  * a `delete` tombstone resets both to zero. `n_ops` counts every change
  * ever seen, `live` is false exactly when the latest change is a
  * tombstone. Update output mode: each micro-batch emits the post-batch
  * state of every touched key (the changelog a downstream serving table
  * ingests).
  *
  * Determinism (rule 1): the running sum is a SEQUENTIAL fold in the
  * key's change order — a fixed IEEE tree the oracle replays with an
  * ordered `list_reduce` — never an associativity-free aggregate sum.
  *
  * Scale posture: state is one fixed-size record per key — O(keys), not
  * O(changes); the per-invocation sort is bounded by a key's volume in
  * ONE micro-batch. Cross-batch order is arrival order, as for any CDC
  * consumer — feed the change log in commit order.
  */
object StreamCdc {

  case class Change(user_id: Long, ts_ns: Long, event_id: Long,
                    op: String, value: Double)
  case class KeyState(nOps: Long, nSince: Long, sumSince: Double,
                      lastTsNs: Long)
  case class Applied(user_id: Long, n_ops: Long, n_since: Long,
                     sum_since: Double, last_ts_ns: Long, live: Boolean)

  /** Update-mode applied state per key from a change stream. */
  def applyCdc(changes: Dataset[Change]): Dataset[Applied] = {
    implicit val outEnc = Encoders.product[Applied]
    implicit val stEnc = Encoders.product[KeyState]
    implicit val longEnc = Encoders.scalaLong
    changes.groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, Applied](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[Change], state: GroupState[KeyState]) =>
          val sorted = batch.toArray.sortBy(c => (c.ts_ns, c.event_id))
          var st = state.getOption.getOrElse(KeyState(0L, 0L, 0.0, Long.MinValue))
          sorted.foreach { c =>
            st =
              if (c.op == "delete") KeyState(st.nOps + 1, 0L, 0.0, c.ts_ns)
              else KeyState(st.nOps + 1, st.nSince + 1,
                st.sumSince + c.value, c.ts_ns)
          }
          state.update(st)
          Applied(uid, st.nOps, st.nSince, st.sumSince, st.lastTsNs,
            st.nSince > 0L)
      }
  }
}
