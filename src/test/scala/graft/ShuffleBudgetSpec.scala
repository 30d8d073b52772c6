package graft

import org.apache.spark.sql.functions._
/** SCALE.md's shuffle-budget table, enforced mechanically: each headline
  * query's physical plan must not contain more shuffle exchanges than its
  * documented budget. A regression that sneaks an extra shuffle into a
  * scan/join/agg (a lost broadcast, a mis-partitioned window chain) fails
  * here at sf0.001 in seconds — long before the bench would surface it as
  * a timing anomaly at 100× the data.
  *
  * Counting is textual over the executed-plan tree (the shared session
  * runs AQE, whose wrapper node hides children from `collect`):
  * `Exchange` lines minus `BroadcastExchange` lines — broadcasts are the
  * POINT of the designs, not a cost to budget.
  */
class ShuffleBudgetSpec extends SparkSpec {

  private def shuffles(q: String): Int = {
    val plan = SparkEntry.queries(q)(spark, sf0001)
      .queryExecution.executedPlan.toString
    // \bExchange\b does not match inside BroadcastExchange/ReusedExchange
    // (no word boundary mid-identifier), so this counts ONLY shuffles
    "\\bExchange\\b".r.findAllIn(plan).size
  }

  // budget = measured count of the DESIGNED plan (see SCALE.md §"Shuffle
  // budget"); an increase is a regression, a decrease is a free win worth
  // reading about — both fail loudly so the table stays honest.
  private val budgets = Map(
    "q1_pricing_summary" -> 1,  // one groupBy
    "q5_region_revenue" -> 1,   // dims broadcast; one agg shuffle
    "q3_shipping_priority" -> 1, // filtered dims broadcast; agg + TakeOrdered
    "j3_broadcast_lookup" -> 0, // pure broadcast lookup
    "j6_asof" -> 1,             // single-shuffle tagged union
    "a3_a4_windows" -> 1,       // key-partitioned window chain
    "w1_last_n" -> 1,           // key-partitioned rank
    "a6_resample_weekly" -> 1,  // one resample agg (MinMaxByPair lane)
    "dedup_exact" -> 1,         // one shuffle on the content hash
    "f4_p1_range_scan" -> 0,    // pushed-filter scan, no shuffle
    "text_tokens" -> 0,         // row-local signals
    "sample_stratified" -> 0,   // hash-threshold filter, no shuffle
    "sample_source_cap" -> 1,   // per-group rank
    // the localCheckpoint'ed filter/sketch builds run their own (bench-
    // sized) shuffles eagerly outside this plan tree; the corpus-side
    // plan measured here is the per-batch steady-state cost
    "decontam_bloom" -> 1,      // final doc_id groupBy only
    "cms_ngram_counts" -> 1,    // probe distinct; lane joins broadcast
    // the exact-count leg is gate evidence; the production sketch alone
    // is 1 (no distinct expansion)
    "hll_distinct" -> 2,
    // assignment window + cell collect + verdict join (2) — grouped pair
    // scan, no self-join (was 10 with assignCells join-back + pair join)
    "semdedup" -> 4,
    "stream_incr_refresh" -> 3,  // two bar aggs + upsert key window
    // decorrelated twin scalar subqueries: two per-partkey agg shuffles
    // (both then BROADCAST back over the fact scan) + the final 1-row agg
    "q17_small_qty" -> 3,
    "q22_not_in" -> 0,           // null-aware broadcast anti-join, no shuffle
    // IN-subquery nesting a correlated scalar agg: two per-key agg
    // shuffles (per-(supp,part) and per-part), everything else broadcast
    "q20_part_supp" -> 2,
    // bench-sized cell-assignment window + ONE corpus probe-rank window
    // (the per-item max reuses its partitioning — no second corpus
    // exchange); centroids and bench cells broadcast
    "decontam_sem_blocked" -> 2,
    // decorrelated EXISTS → semi join (broadcast at test SF; AQE flips to
    // SMJ when the pruned build side outgrows broadcast) + final agg
    "q4_order_priority" -> 1,
    // bucketed co-located fact⋈fact join + same-key agg: the scans carry
    // the hash partitioning, so join AND aggregation shuffle NOTHING
    "j10_bucketed_join" -> 0,
    // correlated-MIN equality (Q2 class): per-partkey min agg (1 shuffle)
    // re-joined to the fact — the static plan SMJs that rejoin (2 more
    // exchanges); at runtime AQE measures the agg side (one row per part)
    // and flips it to broadcast
    "q2_min_cost" -> 3,
    // EXISTS + NOT EXISTS both correlated: semi + anti both broadcast
    // (build sides are pruned orderkey/suppkey pairs); only the final
    // per-supplier agg shuffles
    "q21_waiting" -> 1,
    // derived-view scalar MAX (Q15 class): rev agg under the join (1) +
    // the same agg re-planned under the scalar subquery + its 1-row max
    // (2) — ReusedExchange collapses the twin agg at runtime
    "q15_top_supplier" -> 3,
    // outer-join histogram (Q13 class): per-customer count + the
    // distribution re-agg; orders broadcast into the preserved-side join
    "q13_custdist" -> 2,
    // COUNT(DISTINCT) two-phase: partial distinct on (group, suppkey),
    // final count; part + the NOT IN supplier build both broadcast
    "q16_supplier_cnt" -> 2,
    // IN-over-HAVING (Q18 class): the subquery's per-order agg, the
    // outer per-(cust, order) agg, and the semi-join's build-side agg —
    // dims broadcast throughout
    "q18_large_orders" -> 3,
    // disjunctive-predicate join (Q19 class): per-side OR residues push
    // into BOTH scans, part broadcasts — only the final agg shuffles
    "q19_disjunctive" -> 1,
    // duplicated-span pass: (doc,span) collapse, span-DF agg, dup-set
    // join reshuffle, per-doc re-collapse; the doc-level attach broadcasts
    "dedup_dup_spans" -> 4,
    // JL projection is row-local: one Project + posexplode, NO shuffle
    "emb_rand_proj" -> 0,
    // twin-role nation joins all broadcast; only the final agg shuffles
    "q7_nation_volume" -> 1,
    // 5-join profit tree (Q9 class): supplier/nation/part broadcast,
    // orders broadcast at test SF (co-shuffles on the order key at
    // scale); the (nation, year) agg is the lone exchange
    "q9_product_profit" -> 1,
    // deepest snowflake (8-way, nation in two roles): ALL seven dim sides
    // broadcast — the lone exchange is the per-year share agg
    "q8_market_share" -> 1,
    // fact⋈fact with orders broadcast at test SF (shuffles on the order
    // key at scale); the CASE two-way counts fold into ONE agg exchange
    "q12_ship_priority" -> 1,
    // part broadcasts; numerator+denominator share a single 1-row agg
    "q14_promo_effect" -> 1,
    // market-wide 5-minute resample: one MinMaxByPair HashAggregate
    "a6_resample_minute" -> 1,
    // pure pushed-predicate scan-agg: every filter in PushedFilters,
    // one single-row-per-partition partial-agg exchange
    "q6_forecast_revenue" -> 1,
    // ranked-report star: dims broadcast, one agg, TakeOrderedAndProject
    // (never a global sort)
    "q10_returned_items" -> 1,
    // derived agg + TWO scalar subqueries over it: the static plan carries
    // the per-part agg three times (main + count + sum subqueries) + the
    // 1-row subquery aggs (5 static exchanges); ReusedExchange collapses the twins at runtime
    "q11_important_stock" -> 5,
    // one key-partitioned window chain (corr5 precedent)
    "w6_zscore" -> 1,
    // three dependent conditional-min stages: each re-aggregates the fact
    // joined to the previous stage's (broadcast) per-user row — 2
    // exchanges per stage in the static plan
    "events_funnel" -> 6,
    // per-user cohort agg + the (cohort, offset) distinct + final count
    "events_retention" -> 3,
    // two percentile window chains + the deviation re-rank; the med
    // attach joins broadcast
    "quantiles_mad" -> 3,
    // hash-threshold filter is row-local
    "sample_weighted" -> 0,
    // RANGE-frame window: one key-partitioned exchange, tie-shared frames
    "w8_range_frame" -> 1,
    // INTERSECT: distinct-semi over co-partitioned sides — one exchange
    // pair counted as the aggregation's (AQE dedups the rest at test SF)
    "set2_intersect" -> 1,
    // EXCEPT ALL: per-key multiplicity agg + ReplicateRows generate
    "set3_except_all" -> 1,
    // null-safe equi-join hashes on the coalesced key + final agg
    "j11_nullsafe" -> 1,
    // row-local normalization, no shuffle
    "text_normalize" -> 0,
    // fixed-width binning is one partial-agged groupBy
    "a7_histogram" -> 1,
    // SQ8 scan: queries broadcast; the one exchange is the rank window
    "ann_sq8_topk" -> 1,
    // one Expand feeding ONE aggregation exchange — never per-level scans
    "p6_grouping_sets" -> 1,
    // row-local codec decode
    "mm_bmp" -> 0,
    // row-local codec decode (both endians, PackBits)
    "mm_tiff" -> 0,
    // one key-partitioned navigation window chain
    "w9_lead_lag" -> 1,
    // single-pass profile: multi-column exact distinct = Expand two-phase
    "dq_profile" -> 2,
    // extracted-field agg with one COUNT(DISTINCT): Expand two-phase
    "p7_json_extract" -> 2,
    // packed-word Hamming scan: queries broadcast; the one exchange is
    // the per-query rank window
    "ann_hamming_topk" -> 1,
    // one partial-agged groupBy; turnover/volume exact BIGINT sums
    "a8_vwap" -> 1,
    // keyed full-outer digest compare: both sides co-partition on the key
    "j12_snapshot_diff" -> 2,
    // 2 legs × (per-value agg + the ordered cumulative window, which the
    // unpartitioned totals window shares an exchange with) = 4
    "quantiles_ks_drift" -> 4,
    // blocked Levenshtein: block-size agg + the block self-join's
    // co-partition (its twin side reuses the exchange); ok-filter
    // broadcasts at test SF
    "dedup_edit_distance" -> 2,
    // forward triangle counting DOWNSTREAM of the two checkpointed
    // frames: at test SF the (tiny) oriented edge frame BROADCASTS into
    // both the wedge and closing joins, so the lone exchange is the
    // corner-explode agg; at scale the joins shuffle on node keys — the
    // budget freezes the test-SF broadcast shape
    "graph_triangles" -> 1,
    // round-12 additions
    "text_classify" -> 0,       // row-local hashed-linear fold
    "mm_zip_meta" -> 0,         // row-local codec walk
    "w11_ewma" -> 1,            // one per-key groupBy; fold row-local
    // at test SF the exploded-bin sides BROADCAST (graph_triangles
    // precedent — the budget freezes the test-SF shape); at scale the
    // join co-shuffles on (keys, bin)
    "j13_interval_overlap" -> 0,
    // rank window + cutoff agg share one key exchange and the join-back
    // broadcasts the group-sized cutoff frame
    "quantiles_winsorize" -> 1,
    // round-12 third-session additions
    // one key window chain; both island groupBys reuse its partitioning
    "a10_streaks" -> 1,
    // membership distinct + basket co-partition + pair agg
    "graph_copurchase" -> 3,
    // digit groupBy + the 9-row domain window; domain join broadcasts
    "dq_benford" -> 2,
    // uni + bi aggs, two vocab joins (word-keyed co-partitions), then
    // TakeOrderedAndProject — the vocab side stays a shuffle join on
    // purpose (a 100 TB vocab is NOT broadcast-sized)
    "text_collocations" -> 6,
    // nation agg + the bounded 25-row total window
    "a11_ratio_to_report" -> 2,
    // winsorize's shape: rank window + cuts agg share one exchange
    "quantiles_iqr_outliers" -> 1,
    // first-day agg + per-day news + day domain distinct + date window
    "w14_running_distinct" -> 4,
    // interval build windows share the user exchange; as-of tagged union
    "j15_scd2_lookup" -> 2,
    // one key-partitioned window chain (rn + running max share it)
    "w15_since_event" -> 1,
    // source-keyed lead window + the negative lookup co-partition
    "sample_triplets" -> 2,
    // one groupBy on the canonical key; normalization is row-local
    "dedup_url" -> 1,
    // row-local list arithmetic
    "tok_pad_truncate" -> 0,
    // row-local codec walks
    "mm_webp_meta" -> 0,
    "mm_pdf_meta" -> 0,
    "mm_ogg_meta" -> 0,
    // round-13 additions
    "w16_cusum" -> 1,           // one per-key groupBy; CusumRun row-local
    // bucket groupBy + the (symbol, day) anchored window — different keys
    "a14_anchored_vwap" -> 2,
    // row-local chunking; the copy-count window is the lone exchange
    "dedup_cdc_chunks" -> 1,
    // vocab agg + doc agg; the vocab joins back as a broadcast
    "tok_vocab_coverage" -> 2,
    // sessionize window; session groupBy reuses the user partitioning
    // (subset-key clustering); path groupBy; the rank-of-20 window rides
    // the TakeOrdered single-partition result without a new exchange
    "events_path_topk" -> 2,
    // row-local codec walk
    "mm_mkv_meta" -> 0,
    // round-14 additions
    // real bitstream slice decode is a pure per-row map
    "mm_h264_px" -> 0,
    // broadcast-query scan + the per-query rank window
    "ann_mips_topk" -> 1,
    // per-symbol lag window (1) + the tiny calendar-rank single-partition
    // exchange appearing 3× (the ranked scan and the two rank→date
    // broadcast lookups each rebuild the ~250-row/yr dim — pennies, and
    // the alternative is caching a dim smaller than its cache entry)
    "dq_gap_report" -> 4,
    // the islands windows and both groupBys all reuse one symbol exchange
    "w17_underwater" -> 1,
    // one per-user groupBy; TokenBucketRun is row-local
    "w18_token_bucket" -> 1,
    // one per-supplier window; both ratios share it
    "w19_rank_ratios" -> 1,
    // ONE user exchange: the lag window, gap-rank window, and final agg
    // all cluster on user_id (subset-key reuse)
    "events_inter_arrival" -> 1,
    // one map + one single-row agg exchange
    "dq_table_digest" -> 1,
    // round-15 additions
    // one (doc, bucket) groupBy; hashing row-local
    "emb_hash_bow" -> 1,
    // daily-last dedup window + the two spine distincts (the fill windows
    // reuse the join's (user, d) clustering)
    "w20_ffill_limit" -> 3,
    // per-(symbol, year) epoch agg + the symbol-window re-exchange
    "api_industry_history" -> 2,
    // the epoch derivation (2) + per-(symbol, qdate) as-of rank windows
    // for the two unioned query dates
    "api_industry_asof" -> 4,
    // the CC loop runs eagerly behind localCheckpoint (pair-graph-sized);
    // this plan: corpus join against the (broadcast-sized) component map
    // + the coalesced-component hash — 2
    "sample_leakage_split" -> 2,
    // LSH pairs checkpoint (consumed twice — uncheckpointed, the verify
    // pipeline re-planned per consumer: 14); the residual 6 = the exact
    // lane's inverted-index aggs/joins + the hit join + two count aggs
    "dedup_recall_eval" -> 6,
    // exact-pair aggs + the two signature joins over the checkpointed
    // sig frame
    "dedup_sig_calibration" -> 4,
    // r16 streaming-maintenance gates: the MEASURED plan is the serve
    // (dedup-against / top-k-from-parquet) — the builds + epoch appends
    // run eagerly in the staged-cache block before this plan exists
    "dedup_incremental" -> 10, // serve plan: twin parity with stream_index_append
    "stream_index_append" -> 10,
    "stream_ann_append" -> 3,
    // r17: the pre-filter rides the 16 B/row cells frame — the plan shape
    // (and budget) is EXACTLY the unfiltered serve's
    "ann_ivfpq_filtered" -> 3
  )

  test("q22_not_in plans as a broadcast LeftAnti (null-aware NOT IN shape)") {
    val plan = SparkEntry.queries("q22_not_in")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      "NOT IN must plan as a broadcast anti-join:\n" + plan)
  }

  test("q17_small_qty decorrelates to broadcast joins (no SMJ, no cartesian)") {
    val plan = SparkEntry.queries("q17_small_qty")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "decorrelated Q17 must stay broadcast-joined:\n" + plan)
  }

  test("q20_part_supp decorrelates without a nested-loop join") {
    val plan = SparkEntry.queries("q20_part_supp")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      "nested IN + correlated scalar agg must decorrelate to hash joins:\n" + plan)
  }

  test("q21_waiting plans the correlated EXISTS/NOT EXISTS as semi + anti hash joins") {
    val plan = SparkEntry.queries("q21_waiting")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      "double-correlated EXISTS pair must decorrelate to semi + anti joins:\n" + plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
      "q21 must stay hash-joined:\n" + plan)
  }

  test("q8_market_share broadcasts every dim of the 8-way snowflake") {
    val plan = SparkEntry.queries("q8_market_share")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // seven broadcast sides: part, supplier, orders(test SF), customer,
    // nation×2, region — lineitem is the only streamed side
    assert("BroadcastExchange".r.findAllIn(plan).size >= 6,
      "q8's dims must broadcast, not shuffle:\n" + plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      "q8 must stay hash-joined:\n" + plan)
  }

  test("q13_custdist keeps the zero-match-preserving outer join") {
    val plan = SparkEntry.queries("q13_custdist")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftOuter"),
      "Q13's histogram needs the outer join (c_count=0 bucket):\n" + plan)
  }

  test("q19_disjunctive pushes the per-side OR residue into the part scan") {
    val plan = SparkEntry.queries("q19_disjunctive")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the derived part-side residue: Or(...EqualTo(p_brand...) pushed to
    // the parquet source, so the scan prunes before the join
    assert(plan.contains("PushedFilters") && plan.contains("Or(Or(And(EqualTo(p_brand"),
      "the brand/size OR residue must reach the part scan's PushedFilters:\n" + plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "q19 must stay an equi-join with a residual filter:\n" + plan)
  }

  test("join-strategy hints: SHUFFLE_HASH avoids the sort SMJ pays") {
    // the fact⋈fact strategy menu at 100 TB: SMJ sorts both sides (spill-
    // safe, mergeable); SHJ skips both sorts when the build side fits a
    // task's memory — worth pinning that the hint actually flips the plan
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val shj = li.join(ord.hint("shuffle_hash"),
        li("l_orderkey") === ord("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(shj.contains("ShuffledHashJoin") && !shj.contains("SortMergeJoin"), shj)
    val smj = li.join(ord.hint("merge"),
        li("l_orderkey") === ord("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"), smj)
    // identical results either way, of course
    val a = li.join(ord.hint("shuffle_hash"), li("l_orderkey") === ord("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head()
    val b = li.join(ord.hint("merge"), li("l_orderkey") === ord("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(a == b)
  }

  budgets.foreach { case (q, budget) =>
    test(s"$q stays at $budget shuffle(s)") {
      val n = shuffles(q)
      assert(n == budget,
        s"$q: $n shuffle exchanges, budget $budget — plan changed, " +
          "re-audit (PlanAudit --plan) and update SCALE.md + this table")
    }
  }
}
