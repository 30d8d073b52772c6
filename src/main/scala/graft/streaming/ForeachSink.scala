package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Sinks

/** `foreachBatch` upsert sink — the production pattern for streaming into
  * a keyed table that plain file sinks can't express (they are
  * append-only; a late correction must REPLACE its key's row, not add a
  * duplicate).
  *
  * Exactly-once argument: `foreachBatch` gives at-least-once batch
  * delivery (a crash between sink write and checkpoint commit replays
  * the batch), and [[Sinks.upsertPartitioned]] is IDEMPOTENT on its keys
  * — replaying a batch rewrites the same rows to the same key slots, so
  * at-least-once delivery × idempotent merge = exactly-once table state.
  * That composition (not any sink magic) is the contract; the spec
  * replays a batch deliberately and asserts convergence.
  *
  * The first batch bootstraps the table with a plain partitioned write
  * (upsert needs an existing table to merge into); every later batch
  * merges touched months only — per-batch cost scales with the batch's
  * key/month footprint, not the table.
  */
object ForeachSink {

  /** Apply one micro-batch to the table at `path` (bootstrapping if
    * absent). Public so a replayed-batch test can drive it directly. */
  def applyBatch(batch: DataFrame, path: String, keys: Seq[String],
                 dateCol: String): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      Sinks.writePartitioned(batch, path, dateCol)
    else
      Sinks.upsertPartitioned(spark, path, batch, keys, dateCol)
  }

  def upsertStream(stream: DataFrame, path: String, checkpoint: String,
                   keys: Seq[String], dateCol: String): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) applyBatch(batch, path, keys, dateCol)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
