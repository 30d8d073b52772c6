package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-family operators (SURVEY.md §2.5 W1–W4).
  *
  * All operators take explicit key/order columns so they work over any keyed
  * time series (bars, valuation, events). Ordering columns must be a unique
  * key within a partition for deterministic results — callers append a
  * tiebreaker id when the natural order column can tie.
  *
  * Scale notes: each of these is a single shuffle on the partition key; at
  * 100 TB the partition key (symbol/user) has high cardinality so the shuffle
  * parallelizes evenly. None of them materialize per-key state on the driver.
  */
object Windows {

  /** W1 — last N rows per key, ordered by `order` descending
    * (reference: `get_history(count)` / `get_price(count)`,
    * PTrade_API_mini_Reference.md:1777-1798). Output keeps original rows.
    */
  def lastNPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** W3/A3 — trailing moving average over the previous `n` rows (inclusive).
    * Reference: strategies/simple/backtest.py:66-67 (`sum(prices[-w:])/w`).
    */
  def movingAvg(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                value: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    df.withColumn(as, avg(value).over(w))
  }

  /** A4 — trailing rolling sum over the previous `n` rows (inclusive); the
    * reference's TTM = rolling(4).sum over quarters (docs/DATA_MAPPING.md:741-755).
    */
  def rollingSum(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 value: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    df.withColumn(as, sum(value).over(w))
  }

  /** Time-RANGE frame rolling sum — the frame type ROWS frames can't
    * express: a row's frame is every row whose ORDER VALUE lies in
    * [current − span, current], however many rows share a value. Ties
    * share one frame, so the result is tie-order-free BY CONSTRUCTION —
    * the one window family in this file that needs no tiebreak column.
    * `order` must be numeric (days/seconds as integers — rule 5: derive
    * it by integer arithmetic, never a double division). */
  def rangeSum(df: DataFrame, keys: Seq[Column], order: Column, span: Long,
               value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order).rangeBetween(-span, 0)
    df.withColumn(as, sum(value).over(w))
  }

  /** Trailing-window Pearson correlation of two series — the pairwise
    * window statistic (beta/hedge-ratio precursor) the single-series
    * A3/A4 windows can't express.
    *
    * Determinism (CLAUDE.md rule 1): the five frame sums (Σx, Σy, Σx²,
    * Σy², Σxy) are SEQUENTIAL FOLDS over the frame-ordered value lists —
    * never `sum().over` whose partial-sum association an engine may pick
    * freely — and the correlation is the rational form
    * (n·Σxy − ΣxΣy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)), a fixed IEEE
    * tree the SQL oracle replays with `list_reduce`. Degenerate frames
    * (either variance 0, e.g. a 1-row frame) yield null. `order` must be
    * a unique key per partition (append value tiebreakers — the fixtures
    * contain fully duplicated rows).
    */
  def rollingCorr(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                  x: Column, y: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    val fold0 = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e)
    val foldSq = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e * e)
    df.withColumn("__lx", collect_list(x.cast("double")).over(w))
      .withColumn("__ly", collect_list(y.cast("double")).over(w))
      .withColumn("__nn", size(col("__lx")).cast("double"))
      .withColumn("__sx", fold0(col("__lx")))
      .withColumn("__sy", fold0(col("__ly")))
      .withColumn("__sxx", foldSq(col("__lx")))
      .withColumn("__syy", foldSq(col("__ly")))
      .withColumn("__sxy", fold0(zip_with(col("__lx"), col("__ly"), (a, b) => a * b)))
      .withColumn(as, {
        val num = col("__nn") * col("__sxy") - col("__sx") * col("__sy")
        val dx = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
        val dy = col("__nn") * col("__syy") - col("__sy") * col("__sy")
        when(dx > 0 && dy > 0, num / (sqrt(dx) * sqrt(dy)))
      })
      .drop("__lx", "__ly", "__nn", "__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** Trailing-window OLS slope (rolling beta — the regression member of
    * the rolling-stat family next to [[rollingCorr]] and
    * [[rollingZscore]]): slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), the
    * SAME sequential fold sums as rollingCorr assembled into one fixed
    * IEEE tree (one division, no sqrt), degenerate frames (zero x
    * variance) → null. Determinism contract identical to rollingCorr:
    * fold order pinned by the frame order, `order` must be total. */
  def rollingSlope(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                   x: Column, y: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    val fold0 = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e)
    val foldSq = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e * e)
    df.withColumn("__lx", collect_list(x.cast("double")).over(w))
      .withColumn("__ly", collect_list(y.cast("double")).over(w))
      .withColumn("__nn", size(col("__lx")).cast("double"))
      .withColumn("__sx", fold0(col("__lx")))
      .withColumn("__sy", fold0(col("__ly")))
      .withColumn("__sxx", foldSq(col("__lx")))
      .withColumn("__sxy", fold0(zip_with(col("__lx"), col("__ly"), (a, b) => a * b)))
      .withColumn(as, {
        val num = col("__nn") * col("__sxy") - col("__sx") * col("__sy")
        val dx = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
        when(dx > 0, num / dx)
      })
      .drop("__lx", "__ly", "__nn", "__sx", "__sy", "__sxx", "__sxy")
  }

  /** Trailing-window z-score + outlier flag — the rolling anomaly signal
    * (volatility-normalized move detection over a price/metric stream).
    *
    * Identity-normalized to avoid every boundary hazard:
    *  - mean/std never materialize: z = (x·n − Σx)/√(n·Σx² − (Σx)²), one
    *    FIXED IEEE tree both engines replay verbatim (sqrt is a correctly
    *    rounded IEEE op — [[rollingCorr]]/`quantiles_cont` precedent);
    *  - the outlier verdict is DIVISION- and SQRT-FREE: (x·n − Σx)² >
    *    k²·(n·Σx² − (Σx)²) — pure products of sequentially-folded sums, so
    *    the boolean can't drift even when z sits at the threshold;
    *  - frame sums are sequential folds in frame order (rule 1), and the
    *    caller's `order` must be a total order (rule 2: append the value
    *    columns as final tiebreakers when the time key can tie).
    * Degenerate frames (zero variance) yield null z and flag=false. */
  def rollingZscore(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                    x: Column, n: Int, k: Double, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    val fold0 = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e)
    val foldSq = (l: Column) => aggregate(l, lit(0.0), (a, e) => a + e * e)
    df.withColumn("__lx", collect_list(x.cast("double")).over(w))
      .withColumn("__nn", size(col("__lx")).cast("double"))
      .withColumn("__sx", fold0(col("__lx")))
      .withColumn("__sxx", foldSq(col("__lx")))
      .withColumn(as, {
        val dev = x.cast("double") * col("__nn") - col("__sx")
        val varN2 = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
        when(varN2 > 0, dev / sqrt(varN2))
      })
      .withColumn(s"${as}_outlier", {
        val dev = x.cast("double") * col("__nn") - col("__sx")
        val varN2 = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
        varN2 > 0 && dev * dev > lit(k * k) * varN2
      })
      .drop("__lx", "__nn", "__sx", "__sxx")
  }

  /** W4/J4 — dedup keeping the first row per key under `order` ascending
    * (mootdx_fetcher.py:163 keep='first'). For keep='last' pass descending
    * order columns.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** W2 — suspension forward-fill on a spine: given a frame already joined to
    * the full (key, time) spine (nulls where the key had no row), carry the
    * last non-null observation forward per key
    * (PTrade_API_mini_Reference.md:1792,1975 — suspended days filled with
    * last pre-suspension values).
    */
  def fillForward(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                  fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Forward-fill with a STALENESS BOUND (pandas `ffill(limit=)`): a null
    * is filled only when the latest non-null is at most `limit` rows back;
    * staler gaps stay null. The unbounded fill silently carries a
    * suspended security's last price across months — the bound is the
    * standard guard. Same one-shuffle window as [[fillForward]]: the
    * "rows since last non-null" distance is `rn − max(rn | non-null)` over
    * the cumulative frame. */
  def fillForwardLimit(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                       fillCols: Seq[String], limit: Int): DataFrame = {
    require(limit >= 0, s"negative fill limit $limit")
    // ADVICE r15: the helper column would silently clobber (and then drop)
    // a caller's same-named column — fail loudly instead.
    require(!df.columns.contains("__ffl_rn"),
      "fillForwardLimit: input already has a __ffl_rn column (reserved helper name)")
    val ww = Window.partitionBy(keys: _*).orderBy(order: _*)
    val cum = ww.rowsBetween(Window.unboundedPreceding, 0)
    val withRn = df.withColumn("__ffl_rn", row_number().over(ww))
    fillCols.foldLeft(withRn) { (d, c) =>
      val lastNnRn = max(when(col(c).isNotNull, col("__ffl_rn"))).over(cum)
      d.withColumn(c,
        when(col(c).isNotNull, col(c))
          .when(col("__ffl_rn") - lastNnRn <= limit,
            last(col(c), ignoreNulls = true).over(cum)))
    }.drop("__ffl_rn")
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event EXCEEDS `gapMs` (strict `>`: an exact-gap event extends
    * the session — note Structured Streaming's `session_window` uses a
    * half-open window and splits at exactly the gap). session_id = running
    * count of session starts per key — one shuffle on the key, cumulative
    * sum over the ordered frame. `tiebreak` columns make the window order a
    * unique key when the timestamp alone can tie. */
  def sessionize(df: DataFrame, keys: Seq[Column], tsMillis: Column,
                 gapMs: Long, tiebreak: Seq[Column] = Nil,
                 as: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(tsMillis +: tiebreak: _*)
    val newSession = when(
      tsMillis - lag(tsMillis, 1).over(w) > gapMs || lag(tsMillis, 1).over(w).isNull, 1
    ).otherwise(0)
    df.withColumn(as,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** PTrade derived field `preclose` ≈ lag(close) per key
    * (PTrade_API_mini_Reference.md:1809). */
  def withLag(df: DataFrame, keys: Seq[Column], order: Seq[Column],
              value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn(as, lag(value, 1).over(w))
  }

  /** Exponentially weighted moving average per key —
    * sₜ = α·xₜ + (1−α)·sₜ₋₁, s₀ = x₀ (the quant-standard smoother the
    * ROWS-frame windows can't express: its state is RECURSIVE, every
    * output depends on the entire prefix).
    *
    * Determinism (rule 1): the recursion is a SEQUENTIAL FOLD over the
    * key's (order, value) list in order — a fixed IEEE tree per step that
    * any engine replays bit-for-bit; `sum().over` shapes don't exist
    * here. Pick α exactly representable in binary (0.25, 0.5, 0.125…) so
    * (1−α) is exact too.
    *
    * Plan: ONE groupBy shuffle; each key's history runs through the O(n)
    * [[graft.functions.EwmaRun]] codegen expression (one pass, one output
    * allocation — the `aggregate`+`concat` fold it replaced copied the
    * accumulator array per step, O(n²) in history length) and posexplodes
    * back. Per-key history must fit a row; truly unbounded-history keys
    * belong on [[graft.streaming]] state instead — but the history axis
    * is now linear (docs/SCALEHIST_r13.json). `order` must be unique per
    * key. */
  def ewma(df: DataFrame, keys: Seq[Column], order: Column, value: Column,
           alpha: Double, as: String): DataFrame = {
    val grouped = df.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(order.as("o"), value.as("v")))).as("xs"))
    val run = graft.functions.SeqFoldExpressions.ewmaRun(
      transform(col("xs"), x => x.getField("v")), alpha)
    grouped.withColumn("run", run)
      .select((keys :+ posexplode(arrays_zip(col("xs"), col("run"))).as(Seq("pos", "z"))): _*)
      .select((keys ++ Seq(
        col("z.xs.o").as("o"), col("z.xs.v").as("v"), col("z.run").as(as))): _*)
  }

  /** One-sided CUSUM per key — the sequential change-point statistic
    * (Page 1954): sₜ = max(0, sₜ₋₁ + (xₜ − target)), alarm when sₜ > h.
    * The clip-at-zero makes the recursion inexpressible as any frame
    * aggregate (same class as [[ewma]]); the per-key history runs through
    * the O(n) [[graft.functions.CusumRun]] codegen pass. With
    * integer-valued x and target every state is exact, so the whole
    * series (and the alarm booleans) replays bit-for-bit in SQL.
    * Plan: ONE groupBy shuffle + row-local pass + posexplode. `order`
    * must be unique per key (rule 2). */
  def cusum(df: DataFrame, keys: Seq[Column], order: Column, value: Column,
            target: Double, h: Double, as: String = "cusum"): DataFrame = {
    val grouped = df.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(order.as("o"), value.as("v")))).as("xs"))
    val run = graft.functions.SeqFoldExpressions.cusumRun(
      transform(col("xs"), x => x.getField("v") - lit(target)))
    grouped.withColumn("run", run)
      .select((keys :+ posexplode(arrays_zip(col("xs"), col("run"))).as(Seq("pos", "z"))): _*)
      .select((keys ++ Seq(
        col("z.xs.o").as("o"), col("z.xs.v").as("v"),
        col("z.run").as(as), (col("z.run") > h).as("alarm"))): _*)
  }

  /** TOKEN-BUCKET rate-limit replay per key (the quota/throttle audit):
    * events in (`orderMs`, `tiebreak`) order drain a bucket that starts
    * full at `capMt` milli-tokens and refills `refillPerMs` mtokens per
    * elapsed ms — allowed iff the refilled level covers `costMt`, denied
    * events leave the level untouched (strict policing). All-integer
    * recursion via the O(n) [[graft.functions.TokenBucketRun]] codegen
    * pass (the EwmaRun family — never an O(n²) array-accumulator fold);
    * SQL-exact, streaming twin in [[graft.streaming.StreamRateLimit]].
    * Emits (keys…, ms, tiebreak, allowed, tokens_mt). */
  def tokenBucket(df: DataFrame, keys: Seq[Column], orderMs: Column,
                  tiebreak: Column, costMt: Column,
                  capMt: Long, refillPerMs: Long): DataFrame = {
    val grouped = df.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(orderMs.as("ms"),
        tiebreak.as("tb"), costMt.as("cost")))).as("xs"))
    val run = graft.functions.SeqFoldExpressions.tokenBucketRun(
      transform(col("xs"), x => x.getField("ms")),
      transform(col("xs"), x => x.getField("cost")),
      capMt, refillPerMs)
    grouped.withColumn("run", run)
      .select((keys :+ posexplode(arrays_zip(col("xs"), col("run"))).as(Seq("pos", "z"))): _*)
      .select((keys ++ Seq(
        col("z.xs.ms").as("ms"), col("z.xs.tb").as("tb"),
        (col("z.run").bitwiseAND(1L) === 1L).as("allowed"),
        shiftright(col("z.run"), 1).as("tokens_mt"))): _*)
  }

  /** Exact rolling median (lower median) over the trailing `n` rows —
    * the order statistic no frame-aggregate expresses: the frame must be
    * SORTED per row, so the plan collects the frame list and indexes its
    * sorted form. approx_percentile's sketch is the streaming/huge-frame
    * answer; this is the exact small-frame one (n is a constant like 5
    * or 21 — the frame list is O(n) per row, not per key).
    *
    * Determinism (rule 1): `value` should be integer-typed (or otherwise
    * exactly representable) — sorting and element_at are then exact in
    * any engine; no float sum exists in this operator at all. Lower
    * median = element (size+1)/2 (1-based) of the sorted frame, so even
    * frames take the smaller middle element — integer-only output.
    * `order` must be unique per key (append value tiebreakers; rule 2).
    *
    * Plan: one shuffle on the partition key; the frame list rides the
    * window buffer (bounded by n), sort_array + element_at are row-local.
    */
  def rollingMedian(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                    value: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    val frame = sort_array(collect_list(value).over(w))
    df.withColumn(as, element_at(frame, ((size(frame) + 1) / 2).cast("int")))
  }

  /** Sliding distinct count over the trailing `n` rows — COUNT(DISTINCT)
    * as a window function, which Spark rejects outright (and most engines
    * restrict): expressed as the size of the de-duplicated frame list.
    * Exact by construction (set membership, no floats). Same bounded-frame
    * cost model as [[rollingMedian]]; unbounded-window distinct belongs to
    * HLL sketches ([[graft.ops.Sketches]]) instead. `order` must be
    * unique per key (rule 2 tiebreakers). */
  def slidingDistinct(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                      value: Column, n: Int, as: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*).rowsBetween(-(n - 1), 0)
    df.withColumn(as, size(array_distinct(collect_list(value).over(w))).cast("long"))
  }

  /** Gaps-and-islands change intervals (SCD-2 build): collapse each key's
    * ordered attribute stream into maximal runs of equal `attr` value and
    * emit one validity interval per run — the snapshot→dimension-history
    * derivation every lakehouse pipeline needs (the batch twin of a CDC
    * merge).
    *
    * Returns one row per island: keys, `attr`, `valid_from` (first order
    * value of the run), `valid_to` (the NEXT island's valid_from, null for
    * the current run — half-open [from, to) convention), `n_rows` (run
    * length), `is_current`.
    *
    * Exactness: island detection is lag + a running integer sum; interval
    * bounds are order values verbatim — no float anywhere, so any engine
    * replays it. `order` must be unique per key (rule 2); `attr` must be
    * non-null (null-change semantics would need null-safe compare — keep
    * the contract simple and loud).
    *
    * Plan: one shuffle on the key; both windows and the island groupBy
    * reuse that partitioning (the groupBy keys extend the window
    * partition keys, so Catalyst plans zero extra exchanges).
    */
  def changeIntervals(df: DataFrame, keys: Seq[Column], order: Column,
                      attr: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order)
    val flagged = df
      .withColumn("__chg",
        when(lag(attr, 1).over(w).isNull || lag(attr, 1).over(w) =!= attr, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__chg")).over(
        Window.partitionBy(keys: _*).orderBy(order)
          .rowsBetween(Window.unboundedPreceding, 0)))
    val islands = flagged.groupBy((keys :+ col("__island")): _*)
      .agg(first(attr).as("attr"),
        min(order).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val w2 = Window.partitionBy(keys: _*).orderBy(col("valid_from"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__island")
  }

  /** Gaps-and-islands streak statistics: the length distribution of maximal
    * runs where `x` STRICTLY RISES between consecutive rows per key (the
    * momentum/winning-streak audit every market and engagement pipeline
    * carries). A run breaks whenever x ≤ its predecessor, so every row
    * starts or extends exactly one streak and a key with n rows has
    * between 1 and n streaks. Same two-pass island construction as
    * [[changeIntervals]]: one shuffle on the key, a flag + running-sum
    * window, then a per-island count — no self-join, no state beyond the
    * window frame. Output: one row per key with the streak count, the
    * longest streak, and the length of the final (current) streak.
    */
  /** DRAWDOWN DURATION — time-under-water per key: contiguous runs of
    * rows STRICTLY below the running peak of `x`, summarized as
    * (n_runs, longest_run, n_under). The duration companion to the
    * depth-series drawdown (`api_drawdown`): a strategy that loses 5%
    * for 3 years and one that loses 5% for a week have the same max
    * drawdown and utterly different underwater profiles.
    *
    * Engine-safety: only COMPARISONS touch the (possibly px-division
    * double) values — x < runningMax replays exactly in any engine that
    * computed the same doubles; no sums, no rounding (rule 1). Keys with
    * no underwater rows (monotone non-decreasing series) emit nothing —
    * the report shape, not a zero-filled grid. Islands via the
    * rank-difference trick on the per-key row number. */
  def underwater(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 x: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val flagged = df
      .withColumn("__peak", max(x).over(cum))
      .withColumn("__rn", row_number().over(w))
      .filter(x < col("__peak"))
    val wu = Window.partitionBy(keys: _*).orderBy(col("__rn"))
    flagged.withColumn("__grp", col("__rn") - row_number().over(wu))
      .groupBy((keys :+ col("__grp")): _*)
      .agg(count(lit(1)).as("len"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_runs"),
        max(col("len")).as("longest_run"),
        sum(col("len")).as("n_under"))
  }

  def streaks(df: DataFrame, keys: Seq[Column], order: Seq[Column],
              x: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val cum = Window.partitionBy(keys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val flagged = df
      .withColumn("__brk",
        when(lag(x, 1).over(w).isNull || x <= lag(x, 1).over(w), 1L)
          .otherwise(0L))
      .withColumn("__streak", sum(col("__brk")).over(cum))
    val perStreak = flagged.groupBy((keys :+ col("__streak")): _*)
      .agg(count(lit(1)).as("len"))
    perStreak.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"),
        max_by(col("len"), col("__streak")).as("last_streak"))
  }
}
