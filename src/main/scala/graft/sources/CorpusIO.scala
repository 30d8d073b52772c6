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
  * gzip (not zstd) for the shard codec: the JVM-builtin codec works in
  * every deployment; columnar zstd lives in the parquet lane where it
  * belongs.
  */
object CorpusIO {

  /** Write as gzip-compressed JSON Lines shards (one file per partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "gzip").json(path)

  /** Read JSON Lines (compressed or not) under the given schema contract.
    * Rows that fail to parse come back null-columned (PERMISSIVE), the
    * JSON-lane analogue of the engine's coerce-to-null rule. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
