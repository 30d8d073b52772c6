package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-family operators (SURVEY.md §2.3 J1–J6). */
object Joins {

  /** J6 — as-of join: for each left row, attach the single right row with the
    * greatest `rightTime` such that `rightTime <= leftTime`, within equal
    * join keys. Reference semantics: `get_fundamentals(date=...)` returns the
    * latest report published on or before the query date
    * (PTrade_API_mini_Reference.md:3316,3379-3394).
    *
    * Implementation: union the two sides tagged, sort within (key, time) and
    * forward-fill the right payload — ONE shuffle on the key, no range
    * explosion. This is the scalable plan: a naive `left.join(right,
    * leftTime >= rightTime)` + row_number would be O(|L|·|R|/key) and blow up
    * at 100 TB; the tagged-union plan is O(|L|+|R|) with a single sort.
    *
    * `rightCols` are the payload columns carried from the right side; they
    * must not collide with left column names.
    *
    * Determinism contract: `rightTime` must be unique per key — two right
    * rows at the same (key, time) would be ordered arbitrarily within the
    * fill window. All engine uses satisfy this (event ns-timestamps,
    * monthly factor dates, quarterly publication dates).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame =
    asOfTolerance(left, right, keys, leftTime, rightTime, rightCols, None)

  /** [[asOf]] with a STALENESS BOUND: a match older than `tolerance`
    * (leftTime − matchedRightTime > tolerance, in the time columns' own
    * arithmetic — ns longs in the engine) nulls out instead of forward-
    * filling forever. This is the semantics every fundamentals join
    * actually wants at scale: a quarter-old factor may match, a
    * decade-old one must not. Same single-shuffle tagged-union plan —
    * the bound is a row-local post-filter on the filled payload (the
    * matched right time rides inside the payload struct). */
  def asOfTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    rightCols: Seq[String],
                    tolerance: Option[Column]): DataFrame =
    asOfDirected(left, right, keys, leftTime, rightTime, rightCols,
      tolerance, forward = false)

  /** FORWARD as-of join: for each left row, the single right row with the
    * SMALLEST `rightTime` such that `rightTime >= leftTime` — the
    * next-event direction (trade → next quote, impression → next
    * conversion, signal → next bar open). Same single-shuffle tagged-union
    * plan as [[asOf]], run over the reversed time order; `tolerance`
    * bounds how far into the future a match may sit
    * (matchedRightTime − leftTime > tolerance nulls out). */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String],
                  tolerance: Option[Column] = None): DataFrame =
    asOfDirected(left, right, keys, leftTime, rightTime, rightCols,
      tolerance, forward = true)

  /** NEAREST as-of join: each left row takes whichever right row is
    * temporally closer — the latest at-or-before OR the earliest at-or-
    * after — with ties to the backward match (at-or-before wins, the
    * conservative no-lookahead default). `tolerance` bounds BOTH
    * directions. The classic sensor-alignment/bar-snap semantics
    * ([[asOf]] = backward only, [[asOfForward]] = forward only).
    *
    * Plan: the SAME tagged-union frame as [[asOf]], walked by TWO window
    * fills over opposite time orders — one shuffle on the keys, two sorts
    * (Catalyst reuses the exchange; the second window adds a sort, not a
    * shuffle). Choice and distances are row-local integer compares.
    * Output adds `matched_side` ('back'/'fwd', null when nothing in
    * tolerance) so the pick is auditable. */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightCols: Seq[String],
                  tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__payload", lit(null))
    // null-time rows match nothing in EITHER direction: null right times are
    // excluded (they'd sort at an end of the partition and fill junk), and
    // the per-row fills below are gated on the row's own time being present
    // (the DifferentialSpec null-semantics contract, as in asOfDirected)
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.filter(col(rightTime).isNotNull)
        .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__payload",
          struct((rightCols.map(col) :+ col(rightTime).as("__rt")): _*))
    )((d, c) => d.withColumn(c, lit(null)))
    val cols = keys ++ Seq("__t", "__side") ++ leftCols.filterNot(keys.contains) :+ "__payload"
    val unioned = taggedLeft.select(cols.map(col): _*)
      .unionByName(taggedRight.select(cols.map(col): _*))
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned
      .withColumn("__pb", when(col("__t").isNotNull,
        last(col("__payload"), ignoreNulls = true).over(wB)))
      .withColumn("__pf", when(col("__t").isNotNull,
        last(col("__payload"), ignoreNulls = true).over(wF)))
    val db = col("__t") - col("__pb").getField("__rt")
    val df = col("__pf").getField("__rt") - col("__t")
    val pbT = tolerance.fold(col("__pb"))(t => when(db <= t, col("__pb")))
    val pfT = tolerance.fold(col("__pf"))(t => when(df <= t, col("__pf")))
    val useB = pbT.isNotNull && (pfT.isNull || db <= df)
    val chosen = filled
      .withColumn("__chosen", when(useB, pbT).otherwise(pfT))
      .withColumn("matched_side",
        when(useB, lit("back")).when(pfT.isNotNull, lit("fwd")))
    val extracted = rightCols.foldLeft(chosen) { (d, c) =>
      d.withColumn(c, col("__chosen").getField(c))
    }
    extracted.filter(col("__side") === 1)
      .drop("__t", "__side", "__payload", "__pb", "__pf", "__chosen")
  }

  private def asOfDirected(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTime: String, rightTime: String,
                           rightCols: Seq[String],
                           tolerance: Option[Column],
                           forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct (non-null for every right row,
    // even when individual payload fields are null) so the forward fill
    // distinguishes "no right row yet" from "right row with a null value" —
    // filling the fields individually would skip legitimate nulls.
    // Tag: right rows sort before left rows at the same timestamp so a right
    // row with rightTime == leftTime is visible to that left row (<=).
    val taggedLeft = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__payload", lit(null))
    // NULL right times match NOTHING — and they must be EXCLUDED here, not
    // merely ignored: ascending sort puts NULL `__t` at the partition head,
    // so a null-time right row's (non-null) payload struct would forward-
    // fill into every left row with no real match. Found by the
    // DifferentialSpec fuzz — the composed-lane twin of the AsOfJoinExec
    // null-time cursor stall.
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.filter(col(rightTime).isNotNull)
        .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__payload",
          struct((rightCols.map(col) :+ col(rightTime).as("__rt")): _*))
    )((d, c) => d.withColumn(c, lit(null)))
    val cols = keys ++ Seq("__t", "__side") ++ leftCols.filterNot(keys.contains) :+ "__payload"
    val unioned = taggedLeft.select(cols.map(col): _*)
      .unionByName(taggedRight.select(cols.map(col): _*))
    // Backward walks time ascending and fills the latest right row seen;
    // forward walks time DESCENDING and fills the earliest following right
    // row. Either way right rows sort before left rows at the same
    // timestamp (__side asc) so an equal-time right row is visible (<=/>=).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // NULL LEFT times also match nothing: such rows sort at the head (asc)
    // or tail (desc) and would otherwise read whatever fill is in flight
    // there — gate the fill on the row's own time being present.
    val filled0 = unioned.withColumn("__payload",
      when(col("__t").isNotNull,
        last(col("__payload"), ignoreNulls = true).over(w)))
    val staleness =
      if (forward) col("__payload").getField("__rt") - col("__t")
      else col("__t") - col("__payload").getField("__rt")
    val filled = tolerance.fold(filled0)(tol => filled0.withColumn("__payload",
      when(staleness <= tol, col("__payload"))))
    val extracted = rightCols.foldLeft(filled) { (d, c) =>
      d.withColumn(c, col("__payload").getField(c))
    }
    extracted.filter(col("__side") === 1).drop("__t", "__side", "__payload")
  }

  /** J3 — broadcast lookup with default: left join a small dimension and
    * coalesce the looked-up flag to a default
    * (ptrade_data_api.py:339-358 HALT map with False default). */
  def broadcastLookup(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                      flag: String, default: Column): DataFrame =
    facts.join(broadcast(dim), keys, "left")
      .withColumn(flag, coalesce(col(flag), default))

  /** Skew-salted equi-join — the explicit hot-key story beyond AQE.
    *
    * A shuffle join on a skewed key sends every row of the hottest key to
    * ONE reducer; at 100 TB that task runs for hours while the rest of the
    * stage idles. Salting splits each key's rows across `salts` reducers:
    * the large side gets a deterministic per-row salt (hash of the whole
    * row, mod `salts`), the small side is replicated once per salt value,
    * and the join key becomes (key, salt). Every large row still meets the
    * full small-side match set for its key exactly once → identical result
    * to the plain join, with per-reducer load capped at ~1/salts of the
    * hot key.
    *
    * Only `inner` and `left` are supported: the small side is replicated,
    * so right/full-outer would duplicate unmatched small rows. Use when
    * the small side is too big to broadcast but small enough to replicate
    * `salts`×; otherwise prefer broadcast (no shuffle at all) or AQE's
    * automatic skew-join split.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salting replicates the small side; $joinType is not result-equivalent")
    require(salts > 0, "salts must be positive")
    // hash of the full row: deterministic (content-derived — safe under
    // task retry, unlike rand()/monotonically_increasing_id), and spreads
    // a hot key's rows uniformly
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Keys of `df` occurring more than `minCount` times — the hot set for
    * [[skewSplitJoin]]. At 100 TB run this on a sample (the hot set is by
    * definition visible in any uniform sample); the exact count here keeps
    * the build deterministic. */
  def hotKeys(df: DataFrame, keys: Seq[String], minCount: Long): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > minCount)
      .select(keys.map(col): _*)

  /** Hot-key split join — the other standard skew treatment: rows with hot
    * keys take a broadcast join (no shuffle of the hot mass at all), the
    * long tail takes the normal shuffle join, results union. Equivalent to
    * the plain join for `inner`/`left` because the hot/rest split is a
    * partition of both inputs by the same key predicate.
    */
  def skewSplitJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                    hot: DataFrame, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"split-union is not result-equivalent for $joinType")
    val h = broadcast(hot)
    val largeHot = large.join(h, keys, "left_semi")
    val largeRest = large.join(h, keys, "left_anti")
    val smallHot = small.join(h, keys, "left_semi")
    val smallRest = small.join(h, keys, "left_anti")
    largeHot.join(broadcast(smallHot), keys, joinType)
      .unionByName(largeRest.join(smallRest, keys, joinType))
  }

  /** Binned range join: rows of `points` paired with every `intervals` row
    * whose [lo, hi] (inclusive, long-valued — days, seconds, ids…)
    * contains the point.
    *
    * Spark's native plan for a pure range predicate is
    * BroadcastNestedLoopJoin — O(|P|·|I|) comparisons, a scale-killer the
    * moment neither side broadcasts. Binning turns it into one co-shuffled
    * EQUI-join: each interval explodes to the `hi/bin − lo/bin + 1` bins it
    * overlaps, each point lands in exactly ONE bin (`p div bin`), so a
    * qualifying (point, interval) pair meets exactly once — the exact
    * containment filter after the join needs no dedup pass.
    *
    * Pick `bin` ≈ the typical interval length: interval-side blowup stays
    * ~2× while a bin holds ~(points per bin-width) rows — both sides stay
    * balanced unless the DATA is skewed, in which case the bin key
    * composes with [[saltedJoin]]. Columns of both inputs pass through. */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      pCol: String, loCol: String, hiCol: String,
                      bin: Long): DataFrame = {
    require(bin > 0, s"bin=$bin")
    val p = points.withColumn("__bin", expr(s"$pCol DIV $bin"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"$loCol DIV $bin"), expr(s"$hiCol DIV $bin"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** INTERVAL × INTERVAL overlap join ([[binnedRangeJoin]]'s general
    * form): pairs where [lLo,lHi] ∩ [rLo,rHi] ≠ ∅ within equal `keys`.
    * Both sides explode to their overlapped bins and equi-join on
    * (keys, bin); a matching pair meets in every bin BOTH intervals
    * touch, so the join would duplicate — the emit-once rule keeps a
    * pair only in the bin containing its OVERLAP START
    * (`greatest(lLo, rLo) DIV bin` — exactly one bin per pair), which
    * removes duplicates WITHOUT a distinct shuffle. All bounds are
    * integer day/ns indexes (rule 5). Pick `bin` ≈ the typical interval
    * length; compose the bin key with [[saltedJoin]] for skewed keys. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keys: Seq[String],
                          lLo: String, lHi: String,
                          rLo: String, rHi: String,
                          bin: Long): DataFrame = {
    require(bin > 0, s"bin=$bin")
    val lb = left.withColumn("__bin",
      explode(sequence(expr(s"$lLo DIV $bin"), expr(s"$lHi DIV $bin"))))
    val rb = right.withColumn("__bin",
      explode(sequence(expr(s"$rLo DIV $bin"), expr(s"$rHi DIV $bin"))))
    lb.join(rb, keys :+ "__bin")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === expr(s"greatest($lLo, $rLo) DIV $bin"))
      .drop("__bin")
  }

  /** J4/J5 — upsert (last-wins dedup-merge): existing ∪ incoming, keep the
    * preferred row per key. `prefer` columns rank rows descending (e.g. a
    * batch-id or load timestamp); ties broken by column order.
    * Reference: download_efficient.py:324-335 (`drop_duplicates(keep='last')`).
    * On a cluster this is Delta `MERGE INTO`; the window rewrite keeps the
    * build self-contained. One shuffle on the key.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             prefer: Seq[Column]): DataFrame = {
    val unioned = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((prefer :+ col("__src")).map(_.desc): _*)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Snapshot DIFF (change-data-capture between two table versions — the
    * read-side complement of [[graft.sources.Sinks.publishVersion]]'s
    * write-side snapshots): keyed FULL OUTER compare emitting one row per
    * changed key with `change ∈ {added, removed, changed}`. Non-key
    * columns compare via a canonical per-row digest (md5 over
    * `~`-delimited casts, nulls sentineled) so the comparison cost is one
    * row-local hash per side instead of N column equalities carried
    * through the join — and at 100 TB the digest can be PRECOMPUTED and
    * stored with each snapshot, turning every later diff into a
    * (key, 32 B) join that never rereads the wide payload.
    *
    * One co-partitioned full-outer shuffle on the key; unchanged keys are
    * filtered AFTER the join (they never leave the executor). Both keys
    * and digests are engine-replayable (md5 of the same canonical string
    * — the Md5Hash lane precedent), so the gate hash-compares. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    // the digest input is collision-free by construction: each field is
    // length-prefixed ("len:value", so boundary shifts like ("a|b","c") vs
    // ("a","b|c") can't realign), NULL is the bare \u0000 sentinel (distinct
    // from any length-prefixed value, which always starts with a digit), and
    // fields join on \u0001 (the tokenizer's sep convention) — no printable
    // delimiter a data value could contain
    def digested(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) :+
        md5(concat_ws("\u0001",
          compareCols.map { c =>
            val s = col(c).cast("string")
            coalesce(concat(length(s).cast("string"), lit(":"), s), lit("\u0000"))
          }: _*))
          .as(s"${tag}_digest"): _*)
    val o = digested(old, "old")
    val n = digested(neu, "new")
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("old_digest").isNull, lit("added"))
          .when(col("new_digest").isNull, lit("removed"))
          .when(col("old_digest") =!= col("new_digest"), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
