package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Sketch-based frequency estimation — the bounded-state lane of corpus
  * statistics.
  *
  * Exact n-gram counting (`Relevance.ngramTopK`) shuffles one row per
  * distinct gram: fine until the vocabulary is web-corpus-sized (10⁹+
  * distinct grams at 100 TB — the shuffle is corpus-shaped and the
  * aggregation state unbounded). A Count–Min sketch caps state at
  * depth × width counters NO MATTER the vocabulary: partial aggregation
  * collapses every partition to ≤ depth·width rows before anything moves,
  * and the merged sketch is MBs (3 × 2²⁰ counters = 24 MB of longs) —
  * broadcastable next to the query side like the Bloom filter in
  * [[graft.quality.Decontam.bloomDecontam]].
  *
  * Estimation error is one-sided: est ≥ true always (hash collisions only
  * ADD); est ≤ true + εN with ε = e/width at depth = ln(1/δ) lanes (the
  * standard CM bound). Lanes reuse [[Dedup.HashFamily]] — `Md5Hash` makes
  * every bucket index SQL-replayable, so the gate query carries a full
  * value oracle, collisions included.
  */
object Sketches {

  /** Count–Min estimates for `probes` against the multiset of `items`.
    *
    * @param items  one row per OCCURRENCE (not distinct) with string
    *               column `itemCol`
    * @param probes frame of items to estimate (deduplicated internally)
    * @return (item, est_count) — est_count ≥ the true occurrence count
    */
  def cmsCounts(items: DataFrame, probes: DataFrame, itemCol: String,
                width: Int, depth: Int,
                family: Dedup.HashFamily = Dedup.XxHash): DataFrame = {
    require(width > 0 && depth > 0, s"width=$width depth=$depth")
    def bucket(d: Int): Column =
      pmod(family.lane(d, col("p")), lit(width.toLong))
    // build: one pass over the occurrences; the explode multiplies rows by
    // depth BEFORE the groupBy, but partial aggregation caps what shuffles
    // at depth·width rows per map task — the whole point of the sketch
    val prepped = items.select(family.prep(col(itemCol)).as("p"))
    val sketch = prepped
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d).as("b"))): _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // consumed by `depth` broadcast joins below
    // probe: row-local bucket indexes, one broadcast join per lane, min()
    var q = probes.select(col(itemCol).as("item")).distinct()
      .select(col("item"), family.prep(col("item")).as("p"))
    for (d <- 0 until depth)
      q = q.withColumn(s"b_$d", bucket(d))
        .join(broadcast(sketch.filter(col("d") === d)
          .select(col("b").as(s"b_$d"), col("c").as(s"c_$d"))),
          Seq(s"b_$d"), "left")
    // an absent bucket means zero occurrences hashed there → estimate 0
    val est = least((0 until depth).map(d => coalesce(col(s"c_$d"), lit(0L))): _*)
    q.select(col("item"), est.as("est_count"))
  }

  /** CMS heavy hitters: items whose SKETCH estimate reaches φ = phiNum/
    * phiDen of the stream — the classic frequent-items pass with CMS's
    * one-sided guarantee (estimates never undercount, so the est-heavy
    * set is a SUPERSET of the true heavy set: no false negatives, ever).
    * The emitted `exact_heavy` flag (cross-multiplied integers) carries
    * the evidence; a production caller at 100 TB keeps only the sketch
    * columns and probes a candidate set instead of the full vocabulary.
    * φ compares are integer-multiplied — division-free. */
  def heavyHitters(items: DataFrame, itemCol: String, width: Int, depth: Int,
                   phiNum: Long, phiDen: Long,
                   family: Dedup.HashFamily = Dedup.XxHash): DataFrame = {
    require(phiNum > 0 && phiDen > 0, "degenerate threshold")
    val n = items.count()
    val est = cmsCounts(items, items.select(itemCol), itemCol, width, depth, family)
    val exact = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("exact_count"))
    est.filter(col("est_count") * phiDen >= lit(n) * phiNum)
      .join(exact, Seq("item"))
      .select(col("item"), col("est_count"), col("exact_count"),
        (col("exact_count") * phiDen >= lit(n) * phiNum).as("exact_heavy"))
  }

  /** HyperLogLog++ distinct-count bound check — the cardinality twin of
    * [[cmsCounts]]: at 100 TB a per-group `COUNT(DISTINCT x)` shuffles one
    * row per distinct value (vocabulary-shaped state), while Spark's
    * `approx_count_distinct` (HLL++) caps state at 2^p registers per group
    * regardless of cardinality, merged map-side like any algebraic agg.
    *
    * The sketch estimate itself is engine-specific, so the GATE emits the
    * exact count (hash-comparable) plus a boolean asserting the sketch sat
    * within `tol` relative error — the same bound-check pattern as
    * `quantiles_approx`. Deterministic: HLL++ is hash-based, no rng. The
    * exact count here is gate evidence; a production caller at scale uses
    * the estimate alone and skips the distinct shuffle entirely.
    */
  def hllBoundCheck(df: DataFrame, keys: Seq[String], valueCol: String,
                    rsd: Double = 0.02, tol: Double = 0.1): DataFrame = {
    require(rsd > 0 && tol > 0, s"rsd=$rsd tol=$tol")
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("est"),
        countDistinct(col(valueCol)).as("n_exact"))
      .select(keys.map(col) :+ col("n_exact") :+
        (abs(col("est") - col("n_exact")) <= col("n_exact").cast("double") * tol)
          .as("within_bound"): _*)
  }
}
