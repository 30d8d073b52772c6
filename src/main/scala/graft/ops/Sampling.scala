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

  /** WEIGHTED deterministic sampling — keep probability proportional to a
    * per-row weight (quality score, token count, dedup multiplicity), the
    * curation step between uniform [[bernoulli]] and the per-stratum
    * lanes: keep iff bucket(key) · wMax < weight · rate · 10⁶.
    *
    * Integer cross-multiplication all the way (never weight/wMax as a
    * float): the verdict is exact in any engine. Weights clamp to
    * [0, wMax]; weight = wMax keeps with probability `rate`, weight 0
    * never keeps. Row-local, retry/partitioning/engine independent, and
    * rates nest the way [[bernoulli]]'s do (a row kept at rate r is kept
    * at every r' > r). */
  def weighted(df: DataFrame, key: String, weight: Column, wMax: Long,
               rate: Double = 1.0): DataFrame = {
    // bucket < Scale and w ≤ wMax, so both cross-products are < wMax·Scale:
    // bounding wMax keeps the Long arithmetic provably overflow-free (an
    // overflow would silently FLIP keep verdicts, not crash — ANSI is off)
    require(wMax > 0 && wMax <= Long.MaxValue / Scale,
      s"wMax must be in (0, ${Long.MaxValue / Scale}] so bucket*wMax cannot overflow")
    val w = least(greatest(weight.cast("long"), lit(0L)), lit(wMax))
    df.filter(hashBucket(col(key)) * wMax < w * math.round(rate * Scale))
  }

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

  /** Token-budget mixture sampling — downsample each stratum (language,
    * source domain, …) to a TOKEN budget rather than a fixed rate: the
    * standard "mix domains to target proportions" step of a training-data
    * build, where budgets are known but per-domain corpus sizes are not.
    *
    * rate_g = min(1, budget_g / tokens_g) computed IN the plan from the
    * actual per-stratum token totals (one pre-aggregation, broadcast back —
    * strata counts are tiny), then the same deterministic hash-threshold
    * membership as `bernoulli`. All threshold arithmetic is integer
    * (`DIV`, not `/` — Spark's `/` routes through double and a truncation
    * on the wrong side of an integer boundary would diverge from the
    * oracle's integer division). Strata absent from `budgets` are dropped
    * (threshold 0).
    *
    * Scale posture: one cheap agg over the token column + a broadcast join
    * + a codegen'd filter — the corpus itself is never shuffled.
    */
  def tokenBudgetMixture(df: DataFrame, key: String, strata: String,
                         tokens: String, budgets: Map[String, Long]): DataFrame = {
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, b)) => when(col(strata) === s, lit(b)).otherwise(acc)
    }
    val thresholds = df.groupBy(col(strata))
      .agg(sum(col(tokens)).cast("long").as("stratum_tokens"))
      .filter(col("stratum_tokens") > 0)
      .withColumn("budget_scaled", budget * lit(Scale))
      .withColumn("threshold",
        least(lit(Scale), expr("budget_scaled DIV stratum_tokens")).cast("long"))
      .drop("budget_scaled")
    df.join(broadcast(thresholds), strata)
      .filter(hashBucket(col(key)) < col("threshold"))
  }

  /** Deterministic train/val/test split: label each row by where its hash
    * bucket falls in [0, trainRate·10⁶) / [.., +valRate·10⁶) / the rest.
    * Same determinism contract as [[bernoulli]] — a row's split never
    * changes across runs, clusters, or engines, which is what keeps a
    * val set honest over months of dataset rebuilds. Row-local (no
    * shuffle); rates are frozen into the plan. */
  def split(df: DataFrame, key: String,
            trainRate: Double, valRate: Double): DataFrame = {
    require(trainRate >= 0 && valRate >= 0 && trainRate + valRate <= 1.0,
      s"rates $trainRate/$valRate")
    val t = math.round(trainRate * Scale)
    val v = t + math.round(valRate * Scale)
    df.withColumn("split",
      when(hashBucket(col(key)) < t, "train")
        .when(hashBucket(col(key)) < v, "val")
        .otherwise("test"))
  }

  /** Leakage-safe split — the dedup-aware train/val/test assignment: a
    * near-dup of a held-out document sitting in the training set is eval
    * contamination, so the unit of assignment must be the DEDUP CLUSTER,
    * never the document. `pairs` are verified near-dup pairs (a < b — e.g.
    * [[graft.dedup.Dedup.minHashLsh]] output); connected components over
    * them are the clusters; each document draws its split from the md5
    * bucket of its COMPONENT label (documents in no pair are their own
    * singleton component), so every member of a cluster lands in the same
    * split by construction. Emits the input columns + (component, split).
    *
    * Scale posture: the iterative component loop runs over the PAIR graph
    * only (bucket-capped near-dup pairs — a sliver of the corpus); the
    * corpus-sized work is one left join against the component map (a
    * broadcast in practice: |components| ≤ 2·|pairs|) plus the stateless
    * hash — same cost shape as [[split]]. */
  def leakageSafeSplit(docs: DataFrame, key: String, pairs: DataFrame,
                       a: String, b: String,
                       trainRate: Double, valRate: Double): DataFrame = {
    require(trainRate >= 0 && valRate >= 0 && trainRate + valRate <= 1.0,
      s"rates $trainRate/$valRate")
    val comp = graft.ops.Graph.connectedComponents(
        pairs.select(col(a).as("__src"), col(b).as("__dst")), "__src", "__dst")
      .select(col("node").as(key), col("component"))
    val t = math.round(trainRate * Scale)
    val v = t + math.round(valRate * Scale)
    docs.join(comp, Seq(key), "left")
      .withColumn("component", coalesce(col("component"), col(key)))
      .withColumn("split",
        when(hashBucket(col("component")) < t, "train")
          .when(hashBucket(col("component")) < v, "val")
          .otherwise("test"))
  }

  /** Per-group cap — "source balancing": keep at most `cap` rows per group
    * (domain, crawl host, dump shard…), chosen by the same deterministic
    * hash order as [[bernoulli]] (the kept subset is stable across runs,
    * clusters, engines; ties broken by the key itself). Unlike a RATE,
    * a cap bounds every group's contribution absolutely — the standard
    * guard against a single domain flooding a pretraining mix.
    *
    * One shuffle on the group key; the rank window's state is one counter
    * per group. A group with billions of rows still ranks — at that size
    * pre-filter with [[bernoulli]] at a rate ≫ cap/|group| first (both
    * selections are hash-ordered, so composition stays deterministic). */
  def capPerGroup(df: DataFrame, group: String, key: String,
                  cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(group))
          .orderBy(hashBucket(col(key)), col(key))))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** CLASS-BALANCED downsampling: every group keeps exactly
    * min(|group|) rows — the equalizer a biased training mix needs before
    * a classifier sees it (the majority class otherwise swamps the loss).
    * Selection within each group is hash-ordered ([[capPerGroup]]'s
    * deterministic rank — reproducible on any cluster layout, no RNG
    * state). The min group size is computed IN-PLAN (a 1-row broadcast
    * aggregate, never a driver-side collect), so the whole op is one
    * group-key shuffle + one rank window. */
  def balancePerGroup(df: DataFrame, group: String, key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minSize = df.groupBy(group).agg(count(lit(1)).as("__gn"))
      .agg(min(col("__gn")).as("__min"))
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(group))
          .orderBy(hashBucket(col(key)), col(key))))
      .crossJoin(broadcast(minSize))
      .filter(col("__rk") <= col("__min"))
      .drop("__rk", "__min")
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
