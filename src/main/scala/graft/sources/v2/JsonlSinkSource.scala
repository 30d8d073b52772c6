package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 WRITE connector — the other half of the custom-source
  * story next to [[SyntheticMarketSource]]'s pushdown scan: a JSONL
  * directory sink implementing the full two-phase commit protocol.
  *
  * ```
  * df.write.format("graft.sources.v2.JsonlSinkSource")
  *   .option("path", dir).mode("append").save()
  * ```
  *
  * The contracts that matter on a real cluster:
  *  - each task writes to a UNIQUE temp file (`_temp_<job>_<task>`), so
  *    speculative/retried attempts never collide;
  *  - `DataWriter.commit` reports the temp name to the driver; ONLY
  *    `BatchWrite.commit` renames reported temps to visible
  *    `part-*.jsonl` names — a job that dies mid-write leaves invisible
  *    temps, never a torn table (the staged-swap discipline
  *    `Sinks.compact` uses, here at the protocol level);
  *  - `abort` (driver) and task `abort` delete their temps;
  *  - ALL IO goes through the Hadoop `FileSystem` resolved from the path's
  *    scheme (the `Sinks.compact` precedent), never `java.io.File` — on a
  *    real cluster temps must land in the shared store the driver renames
  *    in, not on executor-local disks;
  *  - non-finite doubles serialize as `null` (bare `NaN`/`Infinity` is
  *    invalid JSON that a strict reader rejects line-wide);
  *  - the schema persists beside the data (`_schema.json`), read-back is
  *    schema-as-contract like `CorpusIO` (no inference scan).
  *
  * Deliberately JSONL: the write PROTOCOL is the demonstration; parquet
  * encoding would just re-wrap Spark's own writer. Append-only
  * (`TableCapability.BATCH_WRITE`) — each job's parts carry a unique job
  * id, so appends accumulate without clobbering.
  */
class JsonlSinkSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only source: schema always comes from the frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new JsonlSinkTable(schema, new CaseInsensitiveStringMap(properties))
  override def supportsExternalMetadata(): Boolean = true
}

final class JsonlSinkTable(schema0: StructType, opts: CaseInsensitiveStringMap)
  extends Table with SupportsWrite {
  override def name(): String = "graft_jsonl_sink"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(opts.get("path"))
      .orElse(Option(info.options.get("path")))
      .getOrElse(throw new IllegalArgumentException("JsonlSinkSource: path option required"))
    // capture the SESSION Hadoop conf here (driver side, session active) so
    // spark.hadoop.* settings — s3a credentials, endpoints, committer tuning
    // — reach both the driver's commit FS and, as a serialized map, every
    // executor writer's FS (a bare `new Configuration()` would ignore them)
    new JsonlWriteBuilder(path, info.schema(), info.queryId(), JsonlFs.sessionConfMap())
  }
}

final class JsonlWriteBuilder(path: String, schema: StructType, queryId: String,
                              confMap: Map[String, String])
  extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new JsonlBatchWrite(path, schema, queryId, confMap)
    override def toStreaming: streaming.StreamingWrite =
      new JsonlStreamingWrite(path, schema, confMap)
  }
}

final case class JsonlCommit(tempName: String, rows: Long,
                             partitionId: Int) extends WriterCommitMessage

final class JsonlBatchWrite(path: String, schema: StructType, queryId: String,
                            confMap: Map[String, String])
  extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new JsonlWriterFactory(path, schema, queryId, confMap)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // Hadoop FileSystem API, not java.io.File (the Sinks.compact precedent):
    // on a real cluster the tasks' temps live in a SHARED store (HDFS/S3A),
    // not on executor-local disks, and the driver's rename must go through
    // the same FS the executors wrote to.
    val (fs, dir) = JsonlFs.resolve(path, confMap)
    fs.mkdirs(dir)
    // schema-as-contract beside the data (idempotent across appends)
    val sf = new org.apache.hadoop.fs.Path(dir, "_schema.json")
    if (!fs.exists(sf)) {
      val out = fs.create(sf, true)
      try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    }
    messages.foreach {
      case m: JsonlCommit =>
        val from = new org.apache.hadoop.fs.Path(dir, m.tempName)
        // the writer's OWN partitionId, not the messages-array index
        // (ADVICE r15: the array order is an engine detail, not a contract)
        val to = new org.apache.hadoop.fs.Path(dir, s"part-$queryId-p${m.partitionId}.jsonl")
        if (!fs.rename(from, to))
          throw new java.io.IOException(s"commit rename failed: $from -> $to")
      case _ => // foreign message type: not ours to commit (mirrors abort)
    }
    fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, dir) = JsonlFs.resolve(path, confMap)
    messages.foreach {
      case JsonlCommit(t, _, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, t), false)
      case _ =>
    }
  }
}

/** STREAMING write (micro-batch sink) — the fourth quadrant of the
  * connector matrix (batch read/write + micro-batch read landed earlier).
  * Exactly-once table contents from at-least-once epoch delivery:
  *
  *  - part names are a pure function of (epochId, writer PARTITION id) —
  *    NO query/run id, so a restarted query re-deriving the same epoch
  *    produces the SAME names (one stream owns a sink directory; that is
  *    the standard file-sink contract); the partition id rides in the
  *    commit message itself, never inferred from array order (ADVICE r15);
  *  - a committed epoch leaves a creation-only `_epoch_<id>` MANIFEST
  *    listing its part names; a REPLAYED epoch (failure between sink
  *    commit and checkpoint write) sees the marker and discards its temps
  *    instead of re-appending;
  *  - a PARTIALLY committed epoch (driver died mid-rename, marker absent)
  *    replays by OVERWRITE-AND-RECONCILE (ADVICE r15): every replay part
  *    replaces any same-named leftover from the dead attempt (a restarted
  *    source may have replanned splits, so colliding names do NOT imply
  *    identical per-part content), and stale `part-e<epoch>-*` files NOT
  *    in the replay's name set are deleted — the epoch's final contents
  *    are exactly one attempt's complete part set, whatever the split.
  */
final class JsonlStreamingWrite(path: String, schema: StructType,
                                confMap: Map[String, String])
  extends streaming.StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : streaming.StreamingDataWriterFactory =
    new JsonlStreamingWriterFactory(path, schema, confMap)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (fs, dir) = JsonlFs.resolve(path, confMap)
    fs.mkdirs(dir)
    val sf = new org.apache.hadoop.fs.Path(dir, "_schema.json")
    if (!fs.exists(sf)) {
      val out = fs.create(sf, true)
      try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    }
    val marker = new org.apache.hadoop.fs.Path(dir, s"_epoch_$epochId")
    if (fs.exists(marker)) {
      // fully committed epoch replayed: drop the replay's temps
      messages.foreach {
        case JsonlCommit(t, _, _) =>
          fs.delete(new org.apache.hadoop.fs.Path(dir, t), false)
        case _ =>
      }
    } else {
      val partName = (pid: Int) => f"part-e$epochId%06d-p$pid.jsonl"
      val mine = messages.collect { case m: JsonlCommit => m }
      mine.foreach { m =>
        val from = new org.apache.hadoop.fs.Path(dir, m.tempName)
        val to = new org.apache.hadoop.fs.Path(dir, partName(m.partitionId))
        // partial-commit replay may have REPLANNED splits: a colliding name
        // does not imply identical content, so the replay's temp WINS
        if (fs.exists(to)) fs.delete(to, false)
        if (!fs.rename(from, to))
          throw new java.io.IOException(s"epoch commit rename failed: $from -> $to")
      }
      // reconcile: stale parts from a dead attempt with different splits
      val names = mine.map(m => partName(m.partitionId)).toSet
      fs.globStatus(new org.apache.hadoop.fs.Path(dir, f"part-e$epochId%06d-*.jsonl"))
        .foreach { st =>
          if (!names.contains(st.getPath.getName)) fs.delete(st.getPath, false)
        }
      // manifest LAST, via temp + RENAME (ADVICE r16: create-then-write
      // left a window where a crash published an EMPTY marker — an epoch
      // reading as committed with a manifest listing no parts). The rename
      // is atomic on the local FS, so the marker appears with its full
      // content or not at all; a failed rename (concurrent committer won)
      // keeps the creation-only semantics.
      val tmpMarker = new org.apache.hadoop.fs.Path(dir,
        s"._epoch_$epochId.tmp-${java.util.UUID.randomUUID}")
      val out = fs.create(tmpMarker, true)
      try out.write(names.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmpMarker, marker)) {
        fs.delete(tmpMarker, false)
        if (!fs.exists(marker))
          throw new java.io.IOException(
            s"epoch $epochId manifest rename failed with no existing marker")
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (fs, dir) = JsonlFs.resolve(path, confMap)
    messages.foreach {
      case JsonlCommit(t, _, _) =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, t), false)
      case _ =>
    }
  }
}

final class JsonlStreamingWriterFactory(path: String, schema: StructType,
                                        confMap: Map[String, String])
  extends streaming.StreamingDataWriterFactory {
  // epoch folded into the writer's id string keeps every attempt's temp
  // unique across epochs AND restarts (taskId differs per attempt)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(path, schema, s"e$epochId", partitionId, taskId, confMap)
}

/** FS resolution shared by driver commit and executor writers: the
  * FileSystem is derived FROM the path's scheme (file://, hdfs://, s3a://)
  * AND the SESSION Hadoop configuration (captured on the driver as a plain
  * serializable map, replayed onto a fresh `Configuration` wherever the FS
  * is opened), so both sides talk to the same store with the same
  * credentials/endpoints. `Configuration.iterator` includes the loaded
  * default resources, so the replayed map is complete on its own. */
private[graft] object JsonlFs {
  def sessionConfMap(): Map[String, String] = {
    val c = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }
  def resolve(path: String, confMap: Map[String, String]): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(c), p)
  }
}

final class JsonlWriterFactory(path: String, schema: StructType, queryId: String,
                               confMap: Map[String, String])
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new JsonlDataWriter(path, schema, queryId, partitionId, taskId, confMap)
}

final class JsonlDataWriter(path: String, schema: StructType, queryId: String,
                            partitionId: Int, taskId: Long,
                            confMap: Map[String, String])
  extends DataWriter[InternalRow] {

  // unique per attempt: a retried task gets a fresh taskId, so the dead
  // attempt's temp can never be committed or collided with
  private val tempName = s"_temp_${queryId}_${partitionId}_$taskId"
  private val (fs, dir) = JsonlFs.resolve(path, confMap)
  private val tempPath = { fs.mkdirs(dir); new org.apache.hadoop.fs.Path(dir, tempName) }
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(tempPath, true), java.nio.charset.StandardCharsets.UTF_8))
  private var rows = 0L

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  override def write(record: InternalRow): Unit = {
    val b = new StringBuilder("{")
    var i = 0
    while (i < schema.length) {
      if (i > 0) b.append(',')
      b.append('"').append(esc(schema(i).name)).append("\":")
      if (record.isNullAt(i)) b.append("null")
      else schema(i).dataType match {
        case LongType => b.append(record.getLong(i))
        case IntegerType => b.append(record.getInt(i))
        case DoubleType =>
          // bare NaN/Infinity is invalid JSON — a strict reader rejects the
          // whole line; non-finite maps to null (the ANSI-off convention)
          val d = record.getDouble(i)
          if (java.lang.Double.isFinite(d)) b.append(d) else b.append("null")
        case BooleanType => b.append(record.getBoolean(i))
        case StringType => b.append('"').append(esc(record.getUTF8String(i).toString)).append('"')
        case dt => throw new UnsupportedOperationException(
          s"JsonlSinkSource: unsupported type $dt (column ${schema(i).name})")
      }
      i += 1
    }
    out.write(b.append('}').toString)
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = { out.close(); JsonlCommit(tempName, rows, partitionId) }
  override def abort(): Unit = { out.close(); fs.delete(tempPath, false) }
  override def close(): Unit = ()
}
