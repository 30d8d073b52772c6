package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the de-facto wire format LLM corpora move in
  * (one JSON document per line, gzip-compressed shards). Parquet is the
  * engine's native storage (`Sinks`); this lane is for ingesting from and
  * exporting to the rest of the ecosystem.
  *
  * Scale posture: Spark's JSON source is a plain distributed text scan —
  * one task per (compressed) shard, no driver involvement. Schema is
  * caller-supplied on read: inference would scan the corpus once EXTRA and
  * can drift per-sample (a column that is integer-valued in one shard and
  * float-valued in another infers differently), so the engine treats the
  * schema as a contract, not a discovery.
  *
  * Shard codecs: gzip (JVM-builtin, works everywhere) and zstd — the
  * declared 100 TB corpus codec (SCALE.md) — via [[ZstdShardCodec]], a
  * Hadoop codec bridge over the zstd-jni that already ships on Spark's
  * classpath. Reading resolves the codec from the file extension
  * (`.gz`/`.zst`), so one reader serves both lanes.
  */
object CorpusIO {

  /** Write as gzip-compressed JSON Lines shards (one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Write as zstd-compressed JSON Lines shards (`.zst`, one file per
    * partition) — zstd-1 class ratio at several× gzip's throughput, the
    * codec the 100 TB corpus actually moves in. */
  def writeJsonlZstd(df: DataFrame, path: String): Unit = {
    ensureZstd(df.sparkSession)
    df.write.mode("overwrite")
      .option("compression", classOf[ZstdShardCodec].getName).json(path)
  }

  /** Read JSON Lines (compressed or not) under the given schema contract.
    * Rows that fail to parse come back null-columned (PERMISSIVE), the
    * JSON-lane analogue of the engine's coerce-to-null rule. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    ensureZstd(spark)
    spark.read.schema(schema).json(path)
  }

  /** Register [[ZstdShardCodec]] in the session's Hadoop conf so
    * `CompressionCodecFactory` resolves `.zst` shards on read — and, just
    * as important, so `isSplitable` sees a (non-splittable) codec for them
    * instead of planning byte-range splits through compressed data.
    * Idempotent; keeps the stock codec list intact. */
  def ensureZstd(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val ours = classOf[ZstdShardCodec].getName
    val cur = Option(conf.get(key)).getOrElse(
      "org.apache.hadoop.io.compress.DefaultCodec," +
        "org.apache.hadoop.io.compress.GzipCodec," +
        "org.apache.hadoop.io.compress.BZip2Codec")
    if (!cur.split(",").map(_.trim).contains(ours))
      conf.set(key, s"$cur,$ours")
  }
}
