package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()`/`rand()` are seed-and-partitioning dependent: a retry, a
  * repartition, or a different executor count changes the sample — poison
  * for reproducible dataset builds. Here membership is a pure function of
  * the ROW KEY: bucket(key) = 60-bit md5 prefix mod 10⁶, keep iff bucket <
  * rate·10⁶. Same row → same verdict on any cluster, any day, any engine
  * with `md5` (the DuckDB oracle replays it exactly — same trick as the
  * Md5Hash dedup lane family).
  *
  * Scale posture: a narrow filter over a scan — no shuffle, no state, and
  * the predicate rides WholeStageCodegen. Rates compose: a 1% sample IS a
  * subset of the 10% sample (nested buckets), which is what incremental
  * dataset scaling needs.
  */
object Sampling {

  val Scale = 1000000L

  /** Stable per-row bucket in [0, 10⁶): 60-bit value from the first 15 md5
    * hex chars (same derivation as Dedup.Md5Hash.h1), mod 10⁶. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % Scale

  /** Keep each row iff bucket(key) < rate·10⁶ — deterministic Bernoulli. */
  def bernoulli(df: DataFrame, key: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(key)) < math.round(rate * Scale))

  /** Per-stratum rates (e.g. downsample dominant languages, keep rare ones
    * whole); strata absent from `rates` get `defaultRate`. */
  def stratified(df: DataFrame, key: String, strata: String,
                 rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultRate * Scale))) { case (acc, (s, r)) =>
      when(col(strata) === s, lit(math.round(r * Scale))).otherwise(acc)
    }
    df.filter(hashBucket(col(key)) < threshold)
  }

  /** Reproducible global shuffle for training order: sort by a seeded hash
    * of the key — identical order on every run/cluster layout. A full sort
    * at 100 TB is real work (range partition + per-partition sort); that is
    * the honest price of a SPECIFIED global order. Shuffling within
    * partitions only (sortWithinPartitions on the hash) is the cheap
    * variant when downstream shards are read independently. */
  def deterministicShuffle(df: DataFrame, key: String, seed: Long): DataFrame =
    df.orderBy(xxhash64(lit(seed), col(key)), col(key))
}
