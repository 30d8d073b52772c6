package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** The Spark 4 `transformWithState` arbitrary-state lane — the successor
  * API to `flatMapGroupsWithState` (which [[StreamSessionizer]] and
  * [[StreamAnomaly]] exercise): typed [[StatefulProcessor]]s with named,
  * individually-encoded state variables, per-variable TTL, and timers,
  * backed by the RocksDB state store (the ONLY provider the operator
  * accepts — state lives off-heap and spills to disk, which is what makes
  * 10⁹-key state tractable where the HDFS-backed map store OOMs).
  *
  * The processor here is deliberately ORDER-FREE (count + integer
  * checksum): `handleInputRows` sees a key's batch rows in shuffle order,
  * so any order-sensitive fold would be nondeterministic across runs —
  * the same rule-1 discipline as groupBy sums, applied to the state API.
  */
object TwState {

  /** Per-key running (count, checksum) over (user_id, event_id % 100)
    * pairs; emits the post-batch totals each time a key sees rows. */
  class CountChecksum
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("agg",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timers: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, cs) = if (st.exists()) st.get() else (0L, 0L)
      rows.foreach { r => n += 1; cs += r._2 % 100 }
      st.update((n, cs))
      Iterator.single((key, n, cs))
    }
  }

  /** Run the processor over a (user_id, event_id) stream; returns
    * (user_id, n_events, checksum) emissions. Scopes the session to the
    * RocksDB provider around the call — transformWithState rejects the
    * default HDFS-backed store — and restores the previous provider
    * after. */
  def runningCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select("user_id", "event_id").as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CountChecksum, TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "n_events", "checksum")
  }

  /** RocksDB provider scoped around `f` (the withReplayConf pattern). */
  def withRocksDb[A](spark: org.apache.spark.sql.SparkSession)(f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
