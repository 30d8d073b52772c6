package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ann.{Ann, Pq, Quant}
import graft.api.PTradeApi
import graft.dedup.Dedup
import graft.domain.MarketViews
import graft.functions.{CodeConvert, Coerce, TextFns, Tokenizer}
import graft.multimodal.{Bmp, Exif, Flac, Gif, H264Meta, H264Px, Ico, Jpeg, Mkv, Mp3Meta, Mp4Meta, Multimodal, Npy, Ogg, Pdf, Png, Srt, TarShard, Tiff, Ttf, Video, Webp, Zip}
import graft.ops.{Aggregates, Graph, Joins, Projections, Quantiles, Sampling, Sketches, Windows}
import graft.quality.{Chunker, DataQuality, Decontam, LangModel, Packer, Redact, Relevance}
import graft.sources.{Sinks, TestData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator (or a tight group) from
  * SURVEY.md §2, expressed through the graft operator library over the
  * driver-provided parquet fixtures; `oracleSql` carries the DuckDB-equivalent
  * ANSI SQL for the driver's correctness gate.
  *
  * Determinism rules (so hash-compare with DuckDB is stable):
  *  - double SUMs go through decimal(25,6) (exact, order-independent) and are
  *    cast back to double;
  *  - every window order includes a unique tiebreaker column;
  *  - engine-order-dependent float outputs (sliding window avg/sum) are
  *    rounded to 4 decimals.
  */
object SparkEntry extends CoreQueriesPart with ShapeQueriesPart
  with JoinQueriesPart with WindowQueriesPart with PipelineQueriesPart
  with ApiQueriesPart {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ shapeQueries ++ joinQueries ++ windowQueries ++ pipelineQueries ++ apiQueries

  /** Shared DuckDB CTE prefix replaying the MarketViews derivation
    * (ticks → bars → calendar/meta → factors → fundamentals) in SQL. */
  private val MKT =
    """WITH ticks AS (
         SELECT CASE WHEN substr(bare,1,1) IN ('6','5','9') THEN bare || '.SS'
                     WHEN substr(bare,1,1) IN ('0','2','3') THEN bare || '.SZ' END AS symbol,
                CAST(l_shipdate AS DATE) AS date,
                l_orderkey*10 + l_linenumber AS seq,
                l_extendedprice / l_quantity AS px,
                l_quantity AS qty, l_extendedprice AS amt
         FROM (SELECT *, lpad(CAST(l_suppkey % 1000000 AS VARCHAR), 6, '0') AS bare FROM lineitem)),
       br AS (SELECT *,
                ROW_NUMBER() OVER (PARTITION BY symbol, date ORDER BY seq, px) AS ra,
                ROW_NUMBER() OVER (PARTITION BY symbol, date ORDER BY seq DESC, px DESC) AS rd
              FROM ticks),
       bars AS (SELECT symbol, date,
                  MAX(CASE WHEN ra=1 THEN px END) AS open, MAX(px) AS high, MIN(px) AS low,
                  MAX(CASE WHEN rd=1 THEN px END) AS close,
                  CAST(CAST(SUM(CAST(qty AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS volume,
                  CAST(CAST(SUM(CAST(amt AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS money
                FROM br GROUP BY symbol, date),
       meta AS (SELECT symbol, MIN(date) AS listed_date, MAX(date) AS de_listed_date
                FROM bars GROUP BY symbol),
       cal AS (SELECT DISTINCT date AS trade_date FROM ticks),
       fev AS (SELECT symbol, MIN(date) AS date
               FROM bars GROUP BY symbol, date_trunc('month', date)),
       fr AS (SELECT symbol, date,
                1.0 + CAST((date_part('month', date) + date_part('day', date)) % 7 - 3 AS DOUBLE)/100.0 AS ratio
              FROM fev),
       adj AS (SELECT symbol, date,
                 list_reduce([CAST(1.0 AS DOUBLE)] ||
                   list(ratio) OVER (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   (a, b) -> a * b) AS backward_a
               FROM fr),
       fqr AS (SELECT symbol, CAST(date_trunc('quarter', date) AS DATE) AS q_start,
                 CAST(CAST(SUM(CAST(amt AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                 COUNT(*) AS n
               FROM ticks GROUP BY 1, 2),
       fund AS (SELECT symbol,
                  CAST(q_start + INTERVAL '3 months' AS DATE) - 1 AS end_date,
                  CAST(q_start + INTERVAL '3 months' AS DATE)
                    + (44 + CAST(substr(symbol,1,6) AS INT) % 30) AS publ_date,
                  revenue,
                  floor(revenue / (n * 1000.0) * 1000000 + 0.5) / 1000000 AS roe
                FROM fqr)"""

  /** The dual-MA strategy P&L derivation (through the per-(symbol, date)
    * `pnl` CTE) shared by the per-symbol and portfolio-level metric
    * oracles — one text, so the two replays can't drift. */
  /** Streaming bar builder replay: batch OHLCV over the same derived
    * ticks, filtered to windows the final watermark passed (append-mode
    * emission: watermark ms = floor(max event-time µs / 1000) − 601000; a
    * window emits when its end ≤ watermark). Integer-valued px/qty make
    * every sum order-free exact; open/close replay min_by/max_by(ts, seq)
    * via unique-(tus, seq) row_number. Shared by stream_bars AND
    * stream_resume — the kill-and-resume run must converge to the same
    * emitted set. */
  private val streamBarsOracleSql: String =
    """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                  epoch_ns(ts) // 1000 AS tus,
                  CAST((event_id * 37) % 10000 AS DOUBLE) AS px,
                  CAST(event_id % 100 + 1 AS DOUBLE) AS qty,
                  event_id AS seq
           FROM events),
         b AS (SELECT *, (tus // 3600000000) * 3600000000 AS bar_start_us FROM t),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus, seq) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus DESC, seq DESC) AS rd
               FROM b),
         g AS (SELECT symbol, bar_start_us,
                 MAX(CASE WHEN ra = 1 THEN px END) AS open,
                 MAX(px) AS high, MIN(px) AS low,
                 MAX(CASE WHEN rd = 1 THEN px END) AS close,
                 SUM(qty) AS volume, SUM(px * qty) AS money,
                 CAST(COUNT(*) AS BIGINT) AS n_ticks
               FROM r GROUP BY symbol, bar_start_us),
         wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us FROM events)
         SELECT symbol, bar_start_us, open, high, low, close, volume, money, n_ticks
         FROM g, wm WHERE bar_start_us + 3600000000 <= wm_us"""

  /** Shared token-bucket fold CTEs (ADVICE r14: the w18_token_bucket and
    * stream_rate_limit oracles duplicated this ~20-line fold with
    * hardcoded constants that had to stay in lockstep with the Scala gate
    * parameters in two places). One text, parameterized by cap/cost —
    * the backtestPnlCtes precedent. Defines e (seconds-grain events),
    * g (per-user ordered [sec, event_id] list) and f (the packed
    * (tokens<<1|allowed) running fold, stride-2 [packed, ts] pairs). */
  private def tokenBucketFoldCtes(capMt: Long, costMt: Long): String =
    s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
                          event_id
                   FROM events),
         g AS (SELECT user_id,
                 list([CAST(sec AS DOUBLE), CAST(event_id AS DOUBLE)]
                      ORDER BY sec, event_id) AS els
               FROM e GROUP BY user_id),
         f AS (SELECT user_id, els,
                 list_reduce([CAST([] AS DOUBLE[])] || els,
                   (acc, el) -> acc || [
                     CASE WHEN len(acc) = 0
                       THEN ($capMt - $costMt) * 2 + 1
                       ELSE (CASE WHEN least($capMt.0, floor(acc[-2] / 2) + (el[1] - acc[-1])) >= $costMt
                             THEN (least($capMt.0, floor(acc[-2] / 2) + (el[1] - acc[-1])) - $costMt) * 2 + 1
                             ELSE least($capMt.0, floor(acc[-2] / 2) + (el[1] - acc[-1])) * 2 END)
                     END, el[1]]) AS run
               FROM g)"""

  private val backtestPnlCtes: String =
    """mal AS (SELECT symbol, date, close,
                   list(CAST(close AS DOUBLE)) OVER wf AS l5,
                   list(CAST(close AS DOUBLE)) OVER ws AS l20
                 FROM bars
                 WINDOW wf AS (PARTITION BY symbol ORDER BY date
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                        ws AS (PARTITION BY symbol ORDER BY date
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
         mm AS (SELECT symbol, date, close,
                  list_reduce([CAST(0 AS DOUBLE)] || l5, (a,b) -> a + b) / len(l5) AS ma_fast,
                  list_reduce([CAST(0 AS DOUBLE)] || l20, (a,b) -> a + b) / len(l20) AS ma_slow
                FROM mal),
         sg AS (SELECT *, CASE WHEN LAG(ma_fast > ma_slow) OVER w IS NULL THEN 'hold'
                               WHEN (ma_fast > ma_slow) AND NOT LAG(ma_fast > ma_slow) OVER w THEN 'buy'
                               WHEN NOT (ma_fast > ma_slow) AND LAG(ma_fast > ma_slow) OVER w THEN 'sell'
                               ELSE 'hold' END AS signal
                FROM mm WINDOW w AS (PARTITION BY symbol ORDER BY date)),
         ps AS (SELECT *, last_value(CASE WHEN signal <> 'hold' THEN signal END IGNORE NULLS)
                            OVER (PARTITION BY symbol ORDER BY date
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_sig
                FROM sg),
         pc AS (SELECT *, CASE WHEN last_sig = 'buy' THEN 1 ELSE 0 END AS position,
                   LAG(CASE WHEN last_sig = 'buy' THEN 1 ELSE 0 END)
                     OVER (PARTITION BY symbol ORDER BY date) AS held,
                   close / LAG(close) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS ret
                FROM ps),
         pnl AS (SELECT symbol, date, signal, position,
                   CASE WHEN held = 1 AND ret IS NOT NULL THEN ret ELSE 0.0 END AS daily_pnl
                 FROM pc)"""

  /** DuckDB replay of MarketViews.industryName — generated from the same
    * sector list so the two can't drift. */
  private val industryCaseSql: String =
    graft.domain.MarketViews.Industries.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }
      .mkString("CASE CAST(substr(symbol,1,6) AS INT) % 8 ", " ", " END")

  /** DuckDB replay of MarketViews.industryNameAt (the VERSIONED rule):
    * code%3==0 symbols rotate one sector per epoch `shift`; generated from
    * the same sector list. Shared CTE `indhist` = the full epoch table
    * (symbol, effective_date, industry) derived from bars — exactly
    * MarketViews.industryHistoryFrom. */
  private def industryCaseAtSql(shift: String): String = {
    val code = "CAST(substr(symbol,1,6) AS INT)"
    graft.domain.MarketViews.Industries.zipWithIndex
      .map { case (n, i) => s"WHEN $i THEN '$n'" }
      .mkString(
        s"CASE ($code + (CASE WHEN $code % 3 = 0 THEN 1 ELSE 0 END) * ($shift)) % 8 ",
        " ", " END")
  }
  private val industryHistoryCtes: String =
    s"""ep AS (SELECT symbol, year(date) AS y, MIN(date) AS effective_date
               FROM bars GROUP BY symbol, year(date)),
        indhist AS (SELECT symbol, effective_date,
            ${industryCaseAtSql("y - MIN(y) OVER (PARTITION BY symbol)")} AS industry
          FROM ep)"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "api_bars" ->
      s"""$MKT SELECT symbol, date, open, high, low, close, volume, money FROM bars""",

    // Calendar-feature replay: weekday via isodow-1 (Spark weekday is
    // Mon=0), integer day gaps, month-boundary flag on the NEXT trading
    // day (both engines null the last row).
    "api_calendar_features" ->
      s"""$MKT SELECT trade_date,
                 CAST(isodow(trade_date) - 1 AS BIGINT) AS dow,
                 CAST(trade_date - lag(trade_date, 1) OVER (ORDER BY trade_date) AS BIGINT) AS gap_days,
                 date_trunc('month', lead(trade_date, 1) OVER (ORDER BY trade_date))
                   <> date_trunc('month', trade_date) AS is_month_end
          FROM cal""",

    // Momentum replay: identical return division, identical percent_rank
    // over the per-date cross-section (ordering compares identical
    // doubles; the ratio divides identical integers).
    "api_factor_momentum" ->
      s"""$MKT, r AS (SELECT symbol, date,
                  close / lag(close, 20) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS ret20
                FROM bars)
          SELECT symbol, date, ret20,
                 percent_rank() OVER (PARTITION BY date ORDER BY ret20) AS mom_pr
          FROM r WHERE ret20 IS NOT NULL""",

    // Realized-vol replay: same return division, null-return filter,
    // ordered 20-frame list, sequential squared fold, √.
    "api_realized_vol" ->
      s"""$MKT, rr AS (SELECT symbol, date,
                  close / lag(close) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS r
                FROM bars),
          f AS (SELECT symbol, date,
                  list(r) OVER (PARTITION BY symbol ORDER BY date
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS lr
                FROM rr WHERE r IS NOT NULL)
          SELECT symbol, date, CAST(len(lr) AS BIGINT) AS n_rets,
                 sqrt(list_reduce([CAST(0 AS DOUBLE)] ||
                   list_transform(lr, v -> v * v), (a, b) -> a + b)) AS rv20
          FROM f""",

    // Top-turnover board: same per-date rank and tie order.
    "api_top_turnover" ->
      s"""$MKT SELECT date, symbol, money,
                 CAST(ROW_NUMBER() OVER (PARTITION BY date
                   ORDER BY money DESC, symbol ASC) AS BIGINT) AS rank
          FROM bars
          QUALIFY rank <= 3""",

    // Drawdown series: selected-value running max + the identical
    // subtract-then-divide tree.
    "api_drawdown" ->
      s"""$MKT SELECT symbol, date, close,
                 MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
                 (close - MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 / MAX(close) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dd
          FROM bars""",

    "api_get_price" ->
      s"""$MKT SELECT symbol, date, close, volume FROM bars
          WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')
            AND date BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""",

    "api_adjusted_price" ->
      s"""$MKT, sel AS (SELECT symbol, date, close FROM bars
                        WHERE symbol IN ('000001.SZ','000002.SZ')
                          AND date BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'),
          j AS (SELECT s.symbol, s.date, s.close, a.backward_a
                FROM sel s ASOF LEFT JOIN adj a
                  ON s.symbol = a.symbol AND s.date >= a.date)
          SELECT symbol, date, close * COALESCE(backward_a, 1.0) AS close FROM j""",

    "api_pre_adjusted" ->
      s"""$MKT, sel AS (SELECT symbol, date, close FROM bars
                        WHERE symbol IN ('000001.SZ','000002.SZ')
                          AND date BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'),
          j AS (SELECT s.symbol, s.date, s.close,
                  COALESCE(a.backward_a, 1.0) AS f0
                FROM sel s ASOF LEFT JOIN adj a
                  ON s.symbol = a.symbol AND s.date >= a.date)
          SELECT symbol, date,
                 close * (f0 / LAST_VALUE(f0) OVER (PARTITION BY symbol ORDER BY date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS close
          FROM j""",

    "api_revenue_ttm" ->
      s"""$MKT SELECT symbol, end_date, revenue,
                 CAST(CAST(SUM(CAST(revenue AS DECIMAL(25,6))) OVER (
                   PARTITION BY symbol ORDER BY end_date
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(25,6)) AS DOUBLE) AS revenue_ttm
          FROM fund WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')""",

    "dq_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
                   CAST(MIN($c) AS DOUBLE) AS min_val,
                   CAST(MAX($c) AS DOUBLE) AS max_val
            FROM lineitem"""
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(one).mkString("\n UNION ALL \n")
    },

    // Expectations replay: same coalesce-to-false per check, same
    // declaration-ordered concat_ws (both engines skip NULL parts).
    "dq_expectations" ->
      """WITH v AS (SELECT l_orderkey, l_linenumber,
            concat_ws(',',
              CASE WHEN coalesce(l_quantity BETWEEN 1 AND 45, FALSE)
                   THEN NULL ELSE 'qty_range' END,
              CASE WHEN coalesce(l_discount <= 0.08, FALSE)
                   THEN NULL ELSE 'disc_cap' END,
              CASE WHEN coalesce(l_tax <= 0.07, FALSE)
                   THEN NULL ELSE 'tax_cap' END) AS violations
          FROM lineitem)
         SELECT l_orderkey, l_linenumber, violations
         FROM v WHERE violations <> ''""",

    // Orphan audit replay: NOT IN ≡ the anti join (fixture keys carry no
    // nulls, where the two differ).
    "dq_referential" ->
      """SELECT 'lineitem_orders' AS relation,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
         UNION ALL
         SELECT 'orders_customer',
                (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
                (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))""",

    // RFM replay: same per-user aggregates, same nearest-rank cut picks,
    // same 1 + Σ(v > cut) buckets.
    "events_rfm" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_type, value
                    FROM events),
          u AS (SELECT user_id, MAX(ts_ns) AS last_ns,
                       CAST(COUNT(*) AS BIGINT) AS f_events,
                       CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(25,6))
                           ELSE CAST(0 AS DECIMAL(25,6)) END) AS DECIMAL(25,6))
                         AS DOUBLE) AS m_value
                FROM e GROUP BY user_id),
          mx AS (SELECT MAX(ts_ns) AS mxn FROM e),
          s AS (SELECT u.*, (mxn - last_ns) // 86400000000000 AS r_days
                FROM u, mx),
          rr AS (SELECT r_days AS v,
                        CAST(ROW_NUMBER() OVER (ORDER BY r_days) AS BIGINT) AS rn,
                        CAST(COUNT(*) OVER () AS BIGINT) AS n FROM s),
          rc AS (SELECT
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.25) AS BIGINT) THEN v END) AS r25,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.50) AS BIGINT) THEN v END) AS r50,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.75) AS BIGINT) THEN v END) AS r75
                 FROM rr),
          fr AS (SELECT f_events AS v,
                        CAST(ROW_NUMBER() OVER (ORDER BY f_events) AS BIGINT) AS rn,
                        CAST(COUNT(*) OVER () AS BIGINT) AS n FROM s),
          fc AS (SELECT
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.25) AS BIGINT) THEN v END) AS f25,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.50) AS BIGINT) THEN v END) AS f50,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.75) AS BIGINT) THEN v END) AS f75
                 FROM fr),
          mr AS (SELECT m_value AS v,
                        CAST(ROW_NUMBER() OVER (ORDER BY m_value) AS BIGINT) AS rn,
                        CAST(COUNT(*) OVER () AS BIGINT) AS n FROM s),
          mc AS (SELECT
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.25) AS BIGINT) THEN v END) AS m25,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.50) AS BIGINT) THEN v END) AS m50,
                   MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE)*0.75) AS BIGINT) THEN v END) AS m75
                 FROM mr)
          SELECT user_id, r_days, f_events, m_value,
                 CAST(1 + (CASE WHEN r_days > r25 THEN 1 ELSE 0 END)
                        + (CASE WHEN r_days > r50 THEN 1 ELSE 0 END)
                        + (CASE WHEN r_days > r75 THEN 1 ELSE 0 END) AS BIGINT) AS r_q,
                 CAST(1 + (CASE WHEN f_events > f25 THEN 1 ELSE 0 END)
                        + (CASE WHEN f_events > f50 THEN 1 ELSE 0 END)
                        + (CASE WHEN f_events > f75 THEN 1 ELSE 0 END) AS BIGINT) AS f_q,
                 CAST(1 + (CASE WHEN m_value > m25 THEN 1 ELSE 0 END)
                        + (CASE WHEN m_value > m50 THEN 1 ELSE 0 END)
                        + (CASE WHEN m_value > m75 THEN 1 ELSE 0 END) AS BIGINT) AS m_q
          FROM s, rc, fc, mc""",

    // Benford replay: same string-rendered first digit, same per-mille
    // literals, exact integer deviations. Window SUMs are BIGINT-cast
    // (DuckDB widens SUM to HUGEINT — the graph_pagerank type-family
    // lesson).
    "dq_benford" ->
      """WITH d AS (SELECT CAST(NULLIF(regexp_extract(
                             CAST(o_totalprice AS VARCHAR), '[1-9]'), '')
                           AS BIGINT) AS digit
                    FROM orders),
          c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
                FROM d WHERE digit IS NOT NULL GROUP BY digit),
          dom(digit, expected_pm) AS (
            VALUES (CAST(1 AS BIGINT), CAST(301 AS BIGINT)), (2, 176),
                   (3, 125), (4, 97), (5, 79), (6, 67), (7, 58), (8, 51),
                   (9, 46)),
          j AS (SELECT dom.digit, dom.expected_pm,
                       COALESCE(c.n_obs, CAST(0 AS BIGINT)) AS n_obs
                FROM dom LEFT JOIN c USING (digit))
          SELECT digit, n_obs, expected_pm,
                 (1000 * n_obs) // CAST(SUM(n_obs) OVER () AS BIGINT) AS share_pm,
                 1000 * n_obs - expected_pm * CAST(SUM(n_obs) OVER () AS BIGINT) AS dev
          FROM j""",

    "dq_bars_invariants" ->
      s"""$MKT, wp AS (SELECT *, LAG(close) OVER (PARTITION BY symbol ORDER BY date) AS preclose
                       FROM bars),
          ps AS (SELECT symbol, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN close IS NULL OR open IS NULL OR high IS NULL OR low IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ohlc,
                   CAST(SUM(CASE WHEN low > high THEN 1 ELSE 0 END) AS BIGINT) AS lo_gt_hi,
                   CAST(SUM(CASE WHEN open > high OR open < low OR close > high OR close < low THEN 1 ELSE 0 END) AS BIGINT) AS ooh_range,
                   CAST(SUM(CASE WHEN volume <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_volume,
                   CAST(SUM(CASE WHEN abs(close / preclose - 1.0) > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS big_moves,
                   MIN(date) AS fd, MAX(date) AS ld
                 FROM wp GROUP BY symbol),
          sp AS (SELECT p.symbol, COUNT(*) AS std
                 FROM cal c JOIN ps p ON c.trade_date BETWEEN p.fd AND p.ld
                 GROUP BY p.symbol)
          SELECT ps.symbol, n_rows, null_ohlc, lo_gt_hi, ooh_range, nonpos_volume,
                 big_moves, (sp.std - n_rows) AS calendar_gaps
          FROM ps LEFT JOIN sp ON ps.symbol = sp.symbol""",

    // Digest replay: identical canonical string (length-prefixed fields,
    // chr(0) null sentinel, chr(1) separator), md5 low 60 bits, HUGEINT
    // sum mod the same Mersenne prime, BIGINT out.
    "dq_table_digest" -> {
      def lp(c: String) =
        s"coalesce(CAST(length(CAST($c AS VARCHAR)) AS VARCHAR) || ':' || CAST($c AS VARCHAR), chr(0))"
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority")
      s"""WITH b AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                       CAST(o_orderdate AS DATE) AS o_orderdate,
                       o_orderpriority
                     FROM orders),
          c AS (SELECT concat_ws(chr(1), ${cols.map(lp).mkString(", ")}) AS canon
                FROM b)
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(CAST(CAST('0x' || substring(md5(canon), 1, 15) AS BIGINT) AS HUGEINT))
                      % 2305843009213693951 AS BIGINT) AS digest
          FROM c"""
    },

    // Island replay: rank-difference on the calendar position; the span
    // comes from each symbol's own bar min/max (≡ meta listed/de_listed).
    "dq_gap_report" ->
      s"""$MKT, rcal AS (SELECT trade_date,
                           ROW_NUMBER() OVER (ORDER BY trade_date) AS rn
                         FROM cal),
          spine AS (SELECT m.symbol, r.trade_date, r.rn
                    FROM rcal r JOIN meta m
                      ON r.trade_date BETWEEN m.listed_date AND m.de_listed_date),
          miss AS (SELECT s.symbol, s.trade_date, s.rn
                   FROM spine s LEFT JOIN bars b
                     ON s.symbol = b.symbol AND s.trade_date = b.date
                   WHERE b.symbol IS NULL),
          isl AS (SELECT symbol, trade_date, rn,
                    rn - ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY rn) AS grp
                  FROM miss),
          agg AS (SELECT symbol, MIN(trade_date) AS gap_start,
                    MAX(trade_date) AS gap_end,
                    CAST(COUNT(*) AS BIGINT) AS n_days
                  FROM isl GROUP BY symbol, grp)
          SELECT symbol, gap_start, gap_end, n_days, sev_rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY symbol
                     ORDER BY n_days DESC, gap_start ASC) AS BIGINT) AS sev_rank
            FROM agg)
          WHERE sev_rank <= 3""",

    // Underwater replay: strict close < running-peak comparison (no
    // arithmetic on the px doubles), islands by rank difference.
    "w17_underwater" ->
      s"""$MKT, pk AS (SELECT symbol, date, close,
                   MAX(close) OVER (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
                   ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date) AS rn
                 FROM bars),
          un AS (SELECT symbol, rn,
                   rn - ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY rn) AS grp
                 FROM pk WHERE close < peak),
          runs AS (SELECT symbol, grp, COUNT(*) AS len FROM un GROUP BY symbol, grp)
          SELECT symbol, CAST(COUNT(*) AS BIGINT) AS n_runs,
                 CAST(MAX(len) AS BIGINT) AS longest_run,
                 CAST(SUM(len) AS BIGINT) AS n_under
          FROM runs GROUP BY symbol""",

    "api_monthly_bars" ->
      s"""$MKT, sel AS (SELECT * FROM bars
                        WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')),
          mb AS (SELECT *, CAST(date_trunc('month', date) AS DATE) AS period,
                   ROW_NUMBER() OVER (PARTITION BY symbol, date_trunc('month', date)
                     ORDER BY date) AS ra,
                   ROW_NUMBER() OVER (PARTITION BY symbol, date_trunc('month', date)
                     ORDER BY date DESC) AS rd
                 FROM sel)
          SELECT symbol, period,
                 MAX(CASE WHEN ra = 1 THEN close END) AS open,
                 MAX(close) AS high, MIN(close) AS low,
                 MAX(CASE WHEN rd = 1 THEN close END) AS close,
                 CAST(CAST(SUM(CAST(volume AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS volume,
                 CAST(CAST(SUM(CAST(money AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS money,
                 COUNT(*) AS n_rows
          FROM mb GROUP BY symbol, period""",

    "api_price_count" ->
      s"""$MKT SELECT symbol, date, close, volume FROM (
            SELECT symbol, date, close, volume,
                   ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date DESC) AS rn
            FROM bars
            WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')
              AND date <= DATE '1997-06-30')
          WHERE rn <= 5""",

    "api_history_ffill" ->
      s"""$MKT, spine AS (SELECT m.symbol, c.trade_date AS date
                          FROM cal c JOIN meta m
                            ON c.trade_date BETWEEN m.listed_date AND m.de_listed_date
                          WHERE m.symbol IN ('000001.SZ','000002.SZ','000003.SZ')),
          jn AS (SELECT s.symbol, s.date, b.close, b.volume
                 FROM spine s LEFT JOIN bars b USING (symbol, date)),
          fl AS (SELECT symbol, date,
                   LAST_VALUE(close IGNORE NULLS) OVER (PARTITION BY symbol ORDER BY date
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
                   COALESCE(volume, 0.0) AS volume
                 FROM jn)
          SELECT symbol, date, close, volume FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date DESC) AS rn
            FROM fl WHERE date <= DATE '1997-06-30')
          WHERE rn <= 30""",

    "api_fundamentals_asof" ->
      s"""$MKT, qd AS (SELECT MIN(trade_date) AS qdate FROM cal
                       GROUP BY date_part('year', trade_date)),
          grid AS (SELECT m.symbol, q.qdate FROM qd q
                   CROSS JOIN (SELECT symbol FROM meta
                               WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')) m)
          SELECT g.symbol, g.qdate, f.end_date, f.revenue, f.roe
          FROM grid g ASOF LEFT JOIN fund f
            ON g.symbol = f.symbol AND g.qdate >= f.publ_date""",

    "api_fund_latest" ->
      s"""$MKT, fundv AS (
            SELECT symbol, end_date, publ_date, revenue, roe, CAST(1 AS BIGINT) AS version FROM fund
            UNION ALL
            SELECT symbol, end_date, publ_date + 20, revenue * 1.02, roe, CAST(2 AS BIGINT)
            FROM fund
            WHERE (CAST(substr(symbol,1,6) AS INT) + date_part('month', end_date)) % 3 = 0),
          qd AS (SELECT MIN(trade_date) AS qdate FROM cal
                 GROUP BY date_part('year', trade_date)),
          grid AS (SELECT m.symbol, q.qdate FROM qd q
                   CROSS JOIN (SELECT symbol FROM meta
                               WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')) m)
          SELECT g.symbol, g.qdate, f.end_date, f.revenue, f.roe, f.version
          FROM grid g ASOF LEFT JOIN fundv f
            ON g.symbol = f.symbol AND g.qdate >= f.publ_date""",

    "api_fundamentals_years" ->
      s"""$MKT
          SELECT symbol, end_date, publ_date, revenue, roe FROM fund
          WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')
            AND date_part('year', end_date) BETWEEN 1995 AND 1996""",

    "api_fund_annual_first" ->
      s"""$MKT, qd AS (SELECT MIN(trade_date) AS qdate FROM cal
                       GROUP BY date_part('year', trade_date)),
          grid AS (SELECT m.symbol, q.qdate FROM qd q
                   CROSS JOIN (SELECT symbol FROM meta
                               WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')) m)
          SELECT g.symbol, g.qdate, f.end_date, f.revenue, f.roe
          FROM grid g ASOF LEFT JOIN
            (SELECT * FROM fund WHERE date_part('month', end_date) = 12) f
            ON g.symbol = f.symbol AND g.qdate >= f.publ_date""",

    "api_stock_status" ->
      s"""$MKT, active AS (SELECT DISTINCT symbol FROM bars WHERE date = DATE '1997-03-03')
          SELECT m.symbol,
                 (a.symbol IS NULL AND DATE '1997-03-03' <= m.de_listed_date) AS is_halt,
                 (DATE '1997-03-03' > m.de_listed_date) AS is_delisted
          FROM meta m LEFT JOIN active a USING (symbol)""",

    "api_valuation" ->
      s"""$MKT SELECT symbol, date,
                 close * volume / money AS pe_ttm,
                 close / open AS pb,
                 money / volume AS ps_ttm,
                 high / low AS pcf,
                 volume / 1000000.0 AS turnover_rate,
                 CAST(NULL AS DOUBLE) AS total_shares,
                 CAST(NULL AS DOUBLE) AS total_value,
                 CAST(NULL AS DOUBLE) AS float_value
          FROM bars
          WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')
            AND date BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""",

    "api_ashares" ->
      s"""$MKT SELECT symbol, 'SEC-' || symbol AS stock_name FROM meta
          WHERE DATE '1997-03-03' BETWEEN listed_date AND de_listed_date""",

    "api_stock_name" ->
      s"""$MKT SELECT symbol, 'SEC-' || symbol AS stock_name FROM meta
          WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')""",

    "api_trading_day" ->
      s"""$MKT, ranked AS (SELECT trade_date,
                 ROW_NUMBER() OVER (ORDER BY trade_date) AS rn FROM cal),
          anchor AS (SELECT MAX(rn) AS arn FROM ranked
                     WHERE trade_date <= DATE '1996-06-15')
          SELECT trade_date, o AS offset
          FROM ranked, anchor, (VALUES (-3),(0),(5)) AS t(o)
          WHERE rn = arn + o""",

    "api_industry_stocks" ->
      s"""$MKT SELECT symbol FROM meta
          WHERE ($industryCaseSql) = 'Banking'
            AND DATE '1995-01-10' BETWEEN listed_date AND de_listed_date""",

    "api_industry_stocks_all" ->
      s"""$MKT SELECT symbol FROM meta
          WHERE ($industryCaseSql) = 'Banking'""",

    "api_industry_history" ->
      s"""$MKT, $industryHistoryCtes
          SELECT symbol, effective_date, industry,
                 '${graft.domain.MarketViews.IndustryClassification}'
                   AS industry_classification
          FROM indhist""",

    "api_industry_asof" ->
      s"""$MKT, $industryHistoryCtes,
          q AS (SELECT DATE '1995-06-30' AS qd, '1995-06-30' AS qdate
                UNION ALL SELECT DATE '1997-06-30', '1997-06-30'),
          r AS (SELECT h.symbol, q.qdate, h.industry,
                  ROW_NUMBER() OVER (PARTITION BY h.symbol, q.qdate
                                     ORDER BY h.effective_date DESC) AS rn
                FROM indhist h JOIN q ON h.effective_date <= q.qd)
          SELECT symbol, qdate FROM r WHERE rn = 1 AND industry = 'Technology'""",

    "api_sector_returns" ->
      s"""$MKT, pr AS (SELECT symbol, date, close,
                        lag(close) OVER (PARTITION BY symbol ORDER BY date) AS prev
                      FROM bars),
          j AS (SELECT ($industryCaseSql) AS industry, symbol, date, close, prev
                FROM pr WHERE prev IS NOT NULL),
          g AS (SELECT industry, date, CAST(COUNT(*) AS BIGINT) AS n_symbols,
                   list_reduce([CAST(0 AS DOUBLE)] || list(close - prev ORDER BY symbol),
                               (a, b) -> a + b) AS sum_chg,
                   list_reduce([CAST(0 AS DOUBLE)] || list(prev ORDER BY symbol),
                               (a, b) -> a + b) AS sum_prev
                FROM j GROUP BY industry, date)
          SELECT industry, date, n_symbols, sum_chg, sum_prev,
                 sum_chg / sum_prev AS sector_ret
          FROM g""",

    "api_index_stocks" ->
      s"""$MKT, smp AS (SELECT MIN(trade_date) AS sample_date FROM cal
                        GROUP BY date_part('year', trade_date)),
          ic AS (SELECT s.sample_date,
                   CASE CAST(substr(m.symbol,1,6) AS INT) % 3
                     WHEN 0 THEN '000300.SS' WHEN 1 THEN '000905.SS'
                     ELSE '000016.SS' END AS index_code,
                   m.symbol
                 FROM smp s CROSS JOIN meta m
                 WHERE s.sample_date BETWEEN m.listed_date AND m.de_listed_date),
          pick AS (SELECT MAX(sample_date) AS sample_date FROM ic
                   WHERE index_code = '000300.SS' AND sample_date <= DATE '1998-06-30')
          SELECT symbol FROM ic JOIN pick USING (sample_date)
          WHERE index_code = '000300.SS'""",

    "api_exrights" ->
      s"""$MKT SELECT symbol,
                 CAST(strftime(date, '%Y%m%d') AS INT) AS date_int, ratio
          FROM fr WHERE symbol IN ('000001.SZ','000002.SZ')""",

    "api_stock_blocks" ->
      s"""$MKT SELECT symbol, $industryCaseSql AS industry,
                 'sws_l1' AS industry_classification
          FROM meta
          WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ',
                           '000004.SZ','000005.SZ','000006.SZ')""",

    "api_indeces" ->
      s"""$MKT, smp AS (SELECT MIN(trade_date) AS sample_date FROM cal
                        GROUP BY date_part('year', trade_date)),
          ic AS (SELECT s.sample_date,
                   CASE CAST(substr(m.symbol,1,6) AS INT) % 3
                     WHEN 0 THEN '000300.SS' WHEN 1 THEN '000905.SS'
                     ELSE '000016.SS' END AS index_code,
                   m.symbol
                 FROM smp s CROSS JOIN meta m
                 WHERE s.sample_date BETWEEN m.listed_date AND m.de_listed_date)
          SELECT DISTINCT index_code FROM ic
          WHERE sample_date <= DATE '1998-06-30'""",

    "api_all_trade_days" ->
      s"""$MKT SELECT trade_date FROM cal
          WHERE trade_date BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""",

    "api_stock_info" ->
      s"""$MKT SELECT symbol, 'SEC-' || symbol AS stock_name,
                 listed_date, de_listed_date,
                 '{"industry": "' || $industryCaseSql
                   || '", "industryClassification": "sws_l1"}' AS blocks
          FROM meta WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')""",

    // Mirrors Indicators.returnsCorrMatrix over the every-10th-symbol
    // subset: same per-symbol LAG returns, date join, date-ordered list
    // folds, rational corr tree (w5 precedent).
    // Market return = per-date mean of symbol-ORDERED return folds; beta
    // via the rationalized slope tree over date-ordered aligned lists.
    "api_beta" ->
      s"""$MKT,
         rets AS (SELECT symbol, date,
                    close / LAG(close) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS ret
                  FROM bars WHERE substr(symbol, 6, 1) = '0'),
         rr AS (SELECT symbol, date, ret FROM rets WHERE ret IS NOT NULL),
         mk AS (SELECT date,
                  list_reduce([CAST(0 AS DOUBLE)] || list(ret ORDER BY symbol),
                    (x, y) -> x + y) / CAST(COUNT(*) AS DOUBLE) AS rm
                FROM rr GROUP BY date),
         pr AS (SELECT r.symbol, r.date, r.ret, m.rm
                FROM rr r JOIN mk m USING (date)),
         ag AS (SELECT symbol,
                  list(rm ORDER BY date) AS lx, list(ret ORDER BY date) AS ly
                FROM pr GROUP BY symbol),
         st AS (SELECT symbol,
                  CAST(len(lx) AS BIGINT) AS n_days,
                  CAST(len(lx) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lx, (x,y) -> x + y) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || ly, (x,y) -> x + y) AS sy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lx, v -> v * v), (x,y) -> x + y) AS sxx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(list_zip(lx, ly), p -> p[1] * p[2]), (x,y) -> x + y) AS sxy
                FROM ag WHERE len(lx) >= 3)
         SELECT symbol, n_days,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
                END AS beta
         FROM st""",

    "api_corr_matrix" ->
      s"""$MKT,
         rets AS (SELECT symbol, date,
                    close / LAG(close) OVER (PARTITION BY symbol ORDER BY date) - 1.0 AS ret
                  FROM bars WHERE substr(symbol, 6, 1) = '0'),
         rr AS (SELECT symbol, date, ret FROM rets WHERE ret IS NOT NULL),
         pr AS (SELECT a.symbol AS sym_a, b.symbol AS sym_b, a.date,
                       a.ret AS ra, b.ret AS rb
                FROM rr a JOIN rr b ON a.date = b.date AND a.symbol < b.symbol),
         ag AS (SELECT sym_a, sym_b,
                  list(ra ORDER BY date) AS la, list(rb ORDER BY date) AS lb
                FROM pr GROUP BY sym_a, sym_b),
         st AS (SELECT sym_a, sym_b,
                  CAST(len(la) AS BIGINT) AS n_days,
                  CAST(len(la) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || la, (x,y) -> x + y) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || lb, (x,y) -> x + y) AS sy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(la, v -> v * v), (x,y) -> x + y) AS sxx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lb, v -> v * v), (x,y) -> x + y) AS syy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(list_zip(la, lb), p -> p[1] * p[2]), (x,y) -> x + y) AS sxy
                FROM ag WHERE len(la) >= 3)
         SELECT sym_a, sym_b, n_days,
                CASE WHEN nn * sxx - sx * sx > 0 AND nn * syy - sy * sy > 0
                     THEN (nn * sxy - sx * sy)
                          / (sqrt(nn * sxx - sx * sx) * sqrt(nn * syy - sy * sy))
                END AS corr
         FROM st""",

    // Mirrors Backtest.dualMaSignals(5,20,exact)+equityCurve+metrics:
    // fold MAs, boolean crossover lag, last-non-hold position, ret/pnl,
    // then one agg per symbol with fold sums + the struct-state drawdown.
    // FIELD ORDER IN THE dd FOLD IS LOAD-BEARING: DuckDB's list_reduce
    // may evaluate struct fields in order with IN-PLACE accumulator
    // updates (observed plan-dependently in 1.0), so every field's reads
    // must be of fields not yet overwritten: dd first (expanded formula —
    // reads old dd/peak/cum only), then peak (old peak/cum), then cum.
    // Under this order the result is identical whether the engine
    // evaluates functionally or in place.
    // Portfolio replay: shared pnl prelude, per-date symbol-ordered fold
    // divided by the total symbol count, then the single-row metric folds
    // (same field-order-safe dd struct).
    "api_portfolio_metrics" ->
      s"""$MKT,
$backtestPnlCtes,
         nsym AS (SELECT CAST(COUNT(DISTINCT symbol) AS BIGINT) AS n FROM pnl),
         pd AS (SELECT date,
                  list_reduce([CAST(0 AS DOUBLE)] || list(daily_pnl ORDER BY symbol),
                    (a,b) -> a + b) / CAST(nsym.n AS DOUBLE) AS pnl
                FROM pnl, nsym GROUP BY date, nsym.n),
         pl AS (SELECT list(pnl ORDER BY date) AS lst FROM pd),
         fo AS (SELECT CAST(len(lst) AS BIGINT) AS n_days,
                  CAST(len(lst) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lst, (a,b) -> a + b) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lst, v -> v * v), (a,b) -> a + b) AS sxx,
                  list_reduce([{'dd': CAST(0 AS DOUBLE), 'peak': CAST(0 AS DOUBLE), 'cum': CAST(0 AS DOUBLE)}] ||
                    list_transform(lst, x -> {'dd': CAST(0 AS DOUBLE), 'peak': CAST(0 AS DOUBLE), 'cum': x}),
                    (a, b) -> {'dd': greatest(a.dd, greatest(a.peak, a.cum + b.cum) - (a.cum + b.cum)),
                               'peak': greatest(a.peak, a.cum + b.cum),
                               'cum': a.cum + b.cum}) AS st
                FROM pl)
         SELECT n_days, (SELECT n FROM nsym) AS n_symbols,
                st.cum AS total_pnl,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN sx / sqrt(nn * sxx - sx * sx) END AS sharpe_core,
                st.dd AS max_drawdown
         FROM fo""",

    "api_backtest_metrics" ->
      s"""$MKT,
$backtestPnlCtes,
         ag AS (SELECT symbol, CAST(count(*) AS BIGINT) AS n_days,
                   CAST(sum(CASE WHEN signal = 'buy' THEN 1 ELSE 0 END) AS BIGINT) AS n_buys,
                   CAST(sum(position) AS BIGINT) AS days_long,
                   list(daily_pnl ORDER BY date) AS lst
                 FROM pnl GROUP BY symbol),
         fo AS (SELECT symbol, n_days, n_buys, days_long,
                   CAST(len(lst) AS DOUBLE) AS nn,
                   list_reduce([CAST(0 AS DOUBLE)] || lst, (a,b) -> a + b) AS sx,
                   list_reduce([CAST(0 AS DOUBLE)] || list_transform(lst, v -> v * v), (a,b) -> a + b) AS sxx,
                   list_reduce([{'dd': CAST(0 AS DOUBLE), 'peak': CAST(0 AS DOUBLE), 'cum': CAST(0 AS DOUBLE)}] ||
                     list_transform(lst, x -> {'dd': CAST(0 AS DOUBLE), 'peak': CAST(0 AS DOUBLE), 'cum': x}),
                     (a, b) -> {'dd': greatest(a.dd, greatest(a.peak, a.cum + b.cum) - (a.cum + b.cum)),
                                'peak': greatest(a.peak, a.cum + b.cum),
                                'cum': a.cum + b.cum}) AS st
                FROM ag)
         SELECT symbol, n_days, n_buys, days_long,
                st.cum AS total_pnl,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN sx / sqrt(nn * sxx - sx * sx) END AS sharpe_core,
                st.dd AS max_drawdown
         FROM fo""",

    "api_indicators" ->
      s"""$MKT, sel AS (SELECT symbol, date, close FROM bars
                        WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')),
          e AS (SELECT symbol, date, close,
                  list_reduce(list(close) OVER wk,
                    (acc, v) -> v * (2.0/13.0) + acc * (1.0 - 2.0/13.0)) AS ema12,
                  list_reduce(list(close) OVER wk,
                    (acc, v) -> v * (2.0/13.0) + acc * (1.0 - 2.0/13.0))
                  - list_reduce(list(close) OVER wk,
                    (acc, v) -> v * (2.0/27.0) + acc * (1.0 - 2.0/27.0)) AS macd
                FROM sel
                WINDOW wk AS (PARTITION BY symbol ORDER BY date
                              ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
          m AS (SELECT *,
                  list_reduce(list(macd) OVER wk2,
                    (acc, v) -> v * (2.0/10.0) + acc * (1.0 - 2.0/10.0)) AS macd_signal
                FROM e
                WINDOW wk2 AS (PARTITION BY symbol ORDER BY date
                               ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
          d AS (SELECT *, close - LAG(close) OVER (PARTITION BY symbol ORDER BY date) AS diff
                FROM m),
          g AS (SELECT *,
                  CASE WHEN diff > 0 THEN diff ELSE 0.0 END AS gain,
                  CASE WHEN diff < 0 THEN -diff ELSE 0.0 END AS loss
                FROM d),
          s AS (SELECT *,
                  list_reduce([CAST(0.0 AS DOUBLE)] || list(gain) OVER w14, (a, v) -> a + v) AS sg,
                  list_reduce([CAST(0.0 AS DOUBLE)] || list(loss) OVER w14, (a, v) -> a + v) AS sl
                FROM g
                WINDOW w14 AS (PARTITION BY symbol ORDER BY date
                               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
          SELECT symbol, date, close, ema12, macd, macd_signal,
                 CASE WHEN sl = 0.0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + sg / sl) END AS rsi
          FROM s""",

    "api_exrights_ab" ->
      s"""$MKT, fr2 AS (SELECT symbol, date, ratio,
                   CAST((date_part('month', date) + date_part('day', date)) % 5 AS DOUBLE) * 0.1 AS cash
                 FROM fr
                 WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ')),
          cumt AS (SELECT symbol, date, ratio, cash,
                     list_reduce(
                       [{'a': CAST(1.0 AS DOUBLE), 'b': CAST(0.0 AS DOUBLE)}] ||
                       list({'a': 1.0 / ratio, 'b': (0.0 - cash) / ratio}) OVER (
                         PARTITION BY symbol ORDER BY date
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       (acc, e) -> {'a': acc.a * e.a, 'b': acc.b * e.a + e.b}) AS cum
                   FROM fr2)
          SELECT symbol, CAST(strftime(date, '%Y%m%d') AS INT) AS date_int,
                 ratio, cash, cum.a AS exer_forward_a, cum.b AS exer_forward_b
          FROM cumt""",

    "api_derived_fields" ->
      s"""$MKT SELECT symbol, date, close, preclose,
                 floor(preclose * 1.1 * 100 + 0.5) / 100 AS high_limit,
                 floor(preclose * 0.9 * 100 + 0.5) / 100 AS low_limit
          FROM (SELECT symbol, date, close,
                  LAG(close) OVER (PARTITION BY symbol ORDER BY date) AS preclose
                FROM bars
                WHERE symbol IN ('000001.SZ','000002.SZ','000003.SZ'))
          WHERE date <= DATE '1996-12-31'""",

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_base_price,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "rollup_revenue" ->
      """SELECT date_part('year', o_orderdate) AS order_year, o_orderstatus,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                COUNT(*) AS n_orders
         FROM orders
         GROUP BY ROLLUP(date_part('year', o_orderdate), o_orderstatus)""",

    "cube_revenue" ->
      """SELECT date_part('year', o_orderdate) AS order_year, o_orderstatus,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                COUNT(*) AS n_orders
         FROM orders
         GROUP BY CUBE(date_part('year', o_orderdate), o_orderstatus)""",

    "q3_topk_revenue" ->
      """SELECT o_orderkey, o_orderdate,
                CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey ASC
         LIMIT 10""",

    "s1_unified_scan" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS date, value,
                CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_value,
                event_type = 'error' AS is_error
         FROM events""",

    "f4_p1_range_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'""",

    "p2_routed_split" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice AS money, l_quantity AS volume
         FROM lineitem""",

    "p4_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS field,
                l_extendedprice AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_quantity' AS field,
                l_quantity AS value FROM lineitem""",

    "f6_reindex" ->
      """SELECT o_orderkey, o_totalprice,
                CAST(NULL AS DOUBLE) AS total_shares,
                CAST(NULL AS DOUBLE) AS float_value
         FROM orders""",

    "f5_status_flags" ->
      """SELECT o_orderkey, o_orderstatus = 'F' AS is_filled,
                CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'other' END AS status_label
         FROM orders WHERE o_orderstatus <> 'P'""",

    "c1_code_roundtrip" ->
      """WITH b AS (
           SELECT c_custkey, lpad(CAST(c_custkey % 1000000 AS VARCHAR), 6, '0') AS bare
           FROM customer),
         p AS (
           SELECT c_custkey,
                  CASE WHEN substr(bare,1,1) IN ('6','5','9') THEN bare || '.SS'
                       WHEN substr(bare,1,1) IN ('0','2','3') THEN bare || '.SZ'
                       ELSE NULL END AS pt
           FROM b),
         q AS (
           SELECT c_custkey, pt,
                  CASE WHEN pt LIKE '%.SS' THEN 'sh.' || substr(pt,1,6)
                       WHEN pt LIKE '%.SZ' THEN 'sz.' || substr(pt,1,6)
                       ELSE NULL END AS bs
           FROM p)
         SELECT c_custkey, pt, bs,
                CASE WHEN bs LIKE 'sh.%' THEN substr(bs,4,6) || '.SS'
                     WHEN bs LIKE 'sz.%' THEN substr(bs,4,6) || '.SZ'
                     ELSE NULL END AS back,
                regexp_matches(bs, '^(sh\.000|sz\.399)') AS is_index
         FROM q""",

    "c2_dates" ->
      """SELECT o_orderkey,
                CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_int,
                CAST(o_orderdate AS DATE) AS date_back,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
         FROM orders""",

    "j3_broadcast_lookup" ->
      """SELECT c_custkey,
                COALESCE(n_name, 'UNKNOWN') AS n_name,
                COALESCE(r_name, 'UNKNOWN') AS r_name
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey""",

    "j6_asof" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value AS purchase_value
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, epoch_ns(ts) AS cts, value AS click_value
                    FROM events WHERE event_type = 'click')
         SELECT p.user_id, p.event_id, p.purchase_value, c.click_value
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tsn >= c.cts""",

    "j6_asof_exec" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value AS purchase_value
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, epoch_ns(ts) AS cts, value AS click_value
                    FROM events WHERE event_type = 'click')
         SELECT p.user_id, p.event_id, p.purchase_value, c.click_value
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tsn >= c.cts""",

    "j6_asof_tol" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value AS purchase_value
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, epoch_ns(ts) AS cts, value AS click_value
                    FROM events WHERE event_type = 'click'),
              a AS (SELECT p.user_id, p.event_id, p.purchase_value,
                           p.tsn, c.cts, c.click_value
                    FROM p ASOF LEFT JOIN c
                      ON p.user_id = c.user_id AND p.tsn >= c.cts)
         SELECT user_id, event_id, purchase_value,
                CASE WHEN tsn - cts <= 3600000000000 THEN click_value END AS click_value
         FROM a""",

    // Mirrors Joins.asOfNearest(tol = 1 h): both ASOF directions, the
    // in-tolerance nearer match wins, ties to backward.
    "j6_asof_nearest" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value AS purchase_value
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, epoch_ns(ts) AS cts, value AS click_value
                    FROM events WHERE event_type = 'click'),
              b AS (SELECT p.user_id, p.event_id, p.purchase_value, p.tsn,
                           c.cts AS bt, c.click_value AS bval
                    FROM p ASOF LEFT JOIN c
                      ON p.user_id = c.user_id AND p.tsn >= c.cts),
              f AS (SELECT p.user_id, p.event_id,
                           c.cts AS ft, c.click_value AS fval
                    FROM p ASOF LEFT JOIN c
                      ON p.user_id = c.user_id AND p.tsn <= c.cts),
              j AS (SELECT b.user_id, b.event_id, b.purchase_value, b.tsn,
                           b.bt, b.bval, f.ft, f.fval,
                           (b.bt IS NOT NULL AND b.tsn - b.bt <= 3600000000000) AS bok,
                           (f.ft IS NOT NULL AND f.ft - b.tsn <= 3600000000000) AS fok
                    FROM b JOIN f ON b.event_id = f.event_id)
         SELECT user_id, event_id, purchase_value,
                CASE WHEN bok AND (NOT fok OR tsn - bt <= ft - tsn) THEN bval
                     WHEN fok THEN fval END AS click_value,
                CASE WHEN bok AND (NOT fok OR tsn - bt <= ft - tsn) THEN 'back'
                     WHEN fok THEN 'fwd' END AS matched_side
         FROM j""",

    "j6_asof_fwd" ->
      """WITH c AS (SELECT user_id, event_id, epoch_ns(ts) AS ctsn, value AS click_value
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, epoch_ns(ts) AS pts, value AS purchase_value
                    FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, c.event_id, c.click_value, p.purchase_value
         FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ctsn <= p.pts""",

    "j1_multiway_outer" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS click_cnt,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS click_sum
                    FROM events WHERE event_type = 'click' GROUP BY user_id),
              v AS (SELECT user_id, COUNT(*) AS view_cnt,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS view_sum
                    FROM events WHERE event_type = 'view' GROUP BY user_id),
              pu AS (SELECT user_id, COUNT(*) AS purchase_cnt,
                      CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS purchase_sum
                    FROM events WHERE event_type = 'purchase' GROUP BY user_id)
         SELECT COALESCE(c.user_id, v.user_id, pu.user_id) AS user_id,
                c.click_cnt, c.click_sum, v.view_cnt, v.view_sum,
                pu.purchase_cnt, pu.purchase_sum
         FROM c FULL JOIN v ON c.user_id = v.user_id
                FULL JOIN pu ON COALESCE(c.user_id, v.user_id) = pu.user_id""",

    "j4_upsert" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice, 0 AS batch
                    FROM orders WHERE o_orderkey % 3 <> 0),
              b AS (SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, 1 AS batch
                    FROM orders WHERE o_orderkey % 2 = 0),
              u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
         SELECT o_orderkey, ROUND(o_totalprice, 4) AS totalprice, batch
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY batch DESC) AS rn
               FROM u)
         WHERE rn = 1""",

    "semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                            AND TIMESTAMP '1996-12-31 00:00:00')""",

    "set1_except" ->
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey NOT IN (
           SELECT l_orderkey FROM lineitem
           WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00')""",

    // The salt is plan-internal — the result is the plain equi-join.
    "j7_salted_join" ->
      """SELECT l_orderkey AS okey, l_linenumber, l_quantity, o_orderstatus
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    // Q3: same decimal-routed revenue; the 10-row cut replays the full
    // deterministic order (revenue DESC, date ASC, orderkey ASC).
    "q3_shipping_priority" ->
      """WITH a AS (
           SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                  o_orderpriority,
                  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue
           FROM customer
             JOIN orders   ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
             AND l_shipdate  > TIMESTAMP '1996-07-01 00:00:00'
           GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority)
         SELECT l_orderkey, o_orderdate, o_orderpriority, revenue
         FROM a
         ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
         LIMIT 10""",

    "q5_region_revenue" ->
      """SELECT n_name,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue
         FROM customer
           JOIN orders   ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           JOIN nation   ON s_nationkey = n_nationkey
           JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY n_name""",

    // Decorrelated replay of the Q17 scalar subqueries: the per-part
    // (Σqty, cnt) CTE is exactly what Catalyst rewrites the correlated
    // form into; the cross-multiplied DECIMAL predicate is division-free
    // on both engines.
    "q17_small_qty" ->
      """WITH pa AS (
           SELECT l_partkey,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(12,6))) AS DECIMAL(25,6)) AS sq,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY l_partkey)
         SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem l
           JOIN part p ON p_partkey = l_partkey
           JOIN pa ON pa.l_partkey = l.l_partkey
         WHERE p_brand = 'Brand#1'
           AND CAST(l_quantity AS DECIMAL(12,6)) * CAST(5 AS DECIMAL(2,0)) * CAST(cnt AS DECIMAL(12,0)) < sq""",

    "q22_not_in" ->
      """SELECT c_custkey, c_mktsegment
         FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00')""",

    // Replays each kind's synthetic dims/units by doc_id % 8 — detection
    // and routing are what's gated; integers only, exact both engines.
    "mm_sniff" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CASE doc_id % 21 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                  WHEN 2 THEN 'gif' WHEN 3 THEN 'ppm' WHEN 4 THEN 'wav'
                  WHEN 5 THEN 'flac' WHEN 6 THEN 'avi' WHEN 7 THEN 'bmp'
                  WHEN 8 THEN 'tiff' WHEN 9 THEN 'h264' WHEN 10 THEN 'mp4'
                  WHEN 11 THEN 'zip' WHEN 12 THEN 'tar' WHEN 13 THEN 'ico'
                  WHEN 14 THEN 'mp3' WHEN 15 THEN 'webp' WHEN 16 THEN 'pdf' WHEN 17 THEN 'ogg'
                  WHEN 18 THEN 'mkv' WHEN 19 THEN 'ttf'
                  ELSE 'opaque' END AS kind,
                CAST(CASE doc_id % 21 WHEN 0 THEN 5 + doc_id % 9
                  WHEN 1 THEN 5 + doc_id % 6 WHEN 2 THEN 5 + doc_id % 7
                  WHEN 3 THEN 4 + doc_id % 5 WHEN 6 THEN 5 + doc_id % 9
                  WHEN 7 THEN 6 + doc_id % 7 WHEN 8 THEN 5 + doc_id % 8
                  WHEN 9 THEN (1 + doc_id % 4) * 16 - 2 * (doc_id % 3)
                  WHEN 10 THEN 16 * (1 + doc_id % 4)
                  WHEN 13 THEN CASE WHEN doc_id % 5 = 0 THEN 256
                               ELSE 4 + doc_id % 5 END
                  WHEN 15 THEN 16 + doc_id % 31
                  WHEN 16 THEN 400 + doc_id % 200
                  WHEN 18 THEN 320 + 16 * (doc_id % 8)
                  WHEN 19 THEN 1000 + 24 * (doc_id % 5)
                  ELSE 0 END AS INT) AS width,
                CAST(CASE doc_id % 21 WHEN 0 THEN 4 + doc_id % 9
                  WHEN 1 THEN 4 + doc_id % 5 WHEN 2 THEN 4 + doc_id % 6
                  WHEN 3 THEN 3 + doc_id % 4 WHEN 6 THEN 4 + doc_id % 9
                  WHEN 7 THEN 3 + doc_id % 6 WHEN 8 THEN 4 + doc_id % 5
                  WHEN 9 THEN (1 + doc_id % 3) * 16 - 2 * (doc_id % 2)
                  WHEN 10 THEN 16 * (1 + doc_id % 3)
                  WHEN 13 THEN CASE WHEN doc_id % 5 = 0 THEN 2
                               ELSE 3 + (2 * doc_id) % 4 END
                  WHEN 15 THEN 9 + (2 * doc_id) % 17
                  WHEN 16 THEN 500 + (3 * doc_id) % 300
                  WHEN 18 THEN 240 + 8 * (doc_id % 6)
                  ELSE 0 END AS INT) AS height,
                CAST(CASE doc_id % 21
                  WHEN 0 THEN (5 + doc_id % 9) * (4 + doc_id % 9)
                  WHEN 1 THEN (5 + doc_id % 6) * (4 + doc_id % 5)
                  WHEN 2 THEN (5 + doc_id % 7) * (4 + doc_id % 6)
                  WHEN 3 THEN (4 + doc_id % 5) * (3 + doc_id % 4)
                  WHEN 4 THEN 64 + doc_id % 57
                  WHEN 5 THEN 64 + doc_id % 57
                  WHEN 6 THEN 2 + doc_id % 4
                  WHEN 7 THEN (6 + doc_id % 7) * (3 + doc_id % 6)
                  WHEN 8 THEN (5 + doc_id % 8) * (4 + doc_id % 5)
                  WHEN 9 THEN 2 + (1 + doc_id % 3) + (doc_id % 5)
                  WHEN 10 THEN 5 + (1 + doc_id % 2)
                  WHEN 11 THEN 2 + doc_id % 3
                  WHEN 12 THEN 2 * (2 + doc_id % 4) + (2 + doc_id % 4 + 1) // 2
                  WHEN 13 THEN 1 + doc_id % 3
                  WHEN 14 THEN 3 + doc_id % 6
                  WHEN 15 THEN CASE WHEN doc_id % 3 < 2 THEN 1
                               WHEN doc_id % 4 = 0 THEN 3 ELSE 2 END
                  WHEN 16 THEN 1 + doc_id % 4
                  WHEN 17 THEN CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 5
                               ELSE 6 END
                  WHEN 18 THEN 13 + 3 * (doc_id % 2)
                  WHEN 19 THEN 100 + doc_id % 50
                  ELSE octet_length(CAST(text AS BLOB)) END AS BIGINT) AS n_units
         FROM documents""",

    // Bucketing is plan-internal — the result is the plain join + agg.
    "j10_bucketed_join" ->
      """SELECT o_orderkey, o_orderstatus, count(*) AS n_items,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderkey, o_orderstatus""",

    "q20_part_supp" ->
      """SELECT s_suppkey, s_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name LIKE 'NATION_1%'
           AND s_suppkey IN (
             SELECT l.l_suppkey
             FROM lineitem l
             WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                   WHERE p_type = 'PROMO')
               AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
               AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
             GROUP BY l.l_suppkey, l.l_partkey
             HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,6)))
                      AS DECIMAL(25,6)) * 5
                  > (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,6)))
                           AS DECIMAL(25,6))
                     FROM lineitem l2
                     WHERE l2.l_partkey = l.l_partkey
                       AND l2.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
                       AND l2.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'))""",

    "q9_product_profit" ->
      """SELECT nation, o_year,
                CAST(CAST(SUM(CAST(amount AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_profit
         FROM (
           SELECT n_name AS nation,
                  CAST(date_part('year', o_orderdate) AS BIGINT) AS o_year,
                  l_extendedprice * (1 - l_discount)
                    - (CAST((l_partkey * 31 + l_suppkey * 17) % 5000 + 100 AS DOUBLE) / 100.0)
                      * l_quantity AS amount
           FROM lineitem
           JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN part ON p_partkey = l_partkey
           WHERE p_type = 'PROMO')
         GROUP BY nation, o_year""",

    "q2_min_cost" ->
      """SELECT p.p_partkey, s.s_suppkey, s.s_name, n.n_name,
                l.l_extendedprice AS min_price
         FROM lineitem l
           JOIN part p ON p.p_partkey = l.l_partkey
           JOIN supplier s ON s.s_suppkey = l.l_suppkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
           JOIN region r ON r.r_regionkey = n.n_regionkey
         WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
           AND l.l_extendedprice =
             (SELECT MIN(l2.l_extendedprice)
              FROM lineitem l2
                JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
              WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA')""",

    "q21_waiting" ->
      """SELECT s.s_name, count(*) AS numwait
         FROM supplier s
           JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
           JOIN orders o ON o.o_orderkey = l1.l_orderkey
           JOIN nation n ON n.n_nationkey = s.s_nationkey
         WHERE o.o_orderstatus = 'F'
           AND n.n_name LIKE 'NATION_%'
           AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         GROUP BY s.s_name""",

    "q15_top_supplier" ->
      """WITH rev AS (
           SELECT l_suppkey AS supplier_no,
                  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)
                    AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name, r.total_revenue
         FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
         WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)""",

    "q6_forecast_revenue" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice * l_discount
                  AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                count(*) AS n_lines
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",

    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
                CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue
         FROM customer c
           JOIN orders o ON c.c_custkey = o.o_custkey
           JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE l.l_returnflag = 'R'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
         GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
         ORDER BY revenue DESC, c_custkey ASC LIMIT 20""",

    "q11_important_stock" ->
      """WITH pv AS (SELECT l_partkey,
                       CAST(SUM(CAST(l_extendedprice * l_quantity
                         AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS v
                     FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey, CAST(v AS DOUBLE) AS stock_value
         FROM pv
         WHERE v * (SELECT COUNT(*) FROM pv) * 10
             > (SELECT SUM(v) FROM pv) * 15""",

    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
                CAST(CAST(SUM(volume) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                count(*) AS n_lines
         FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(year(l_shipdate) AS BIGINT) AS l_year,
                      CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS volume
               FROM lineitem
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN orders ON o_orderkey = l_orderkey
                 JOIN customer ON c_custkey = o_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
               WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         GROUP BY supp_nation, cust_nation, l_year""",

    "q13_custdist" ->
      """WITH c_orders AS (
           SELECT c.c_custkey, count(o.o_orderkey) AS c_count
           FROM customer c LEFT OUTER JOIN orders o
             ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '1-URGENT'
           GROUP BY c.c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM c_orders GROUP BY c_count""",

    "q16_supplier_cnt" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
                count(DISTINCT l.l_suppkey) AS supplier_cnt
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE p.p_brand <> 'Brand#1'
           AND p.p_type <> 'STANDARD'
           AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
           AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_acctbal < 0)
         GROUP BY p.p_brand, p.p_type, p.p_size""",

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,6)))
                    AS DECIMAL(25,6)) AS DOUBLE) AS sum_qty
         FROM customer
           JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(12,6))) > 150)
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""",

    "q19_disjunctive" ->
      """SELECT p.p_brand,
                CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS revenue,
                count(*) AS n_lines
         FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 20 AND 30)
         GROUP BY p.p_brand""",

    "q8_market_share" ->
      """SELECT o_year,
                CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                                   ELSE CAST(0 AS DECIMAL(25,6)) END)
                    AS DECIMAL(25,6)) AS DOUBLE)
                  / CAST(CAST(SUM(volume) AS DECIMAL(25,6)) AS DOUBLE)
                  AS mkt_share,
                count(*) AS n_lines
         FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS volume,
                      n2.n_name AS supp_nation
               FROM part
                 JOIN lineitem ON p_partkey = l_partkey
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON c_nationkey = n1.n_nationkey
                 JOIN region ON n1.n_regionkey = r_regionkey
                 JOIN nation n2 ON s_nationkey = n2.n_nationkey
               WHERE r_name = 'ASIA'
                 AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                 AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
                 AND p_type = 'MEDIUM')
         GROUP BY o_year""",

    "q12_ship_priority" ->
      """SELECT l_returnflag AS ship_class,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_linestatus = 'F'
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_returnflag""",

    "q14_promo_effect" ->
      """SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                    ELSE CAST(0 AS DECIMAL(25,6)) END)
                  AS DECIMAL(25,6)) AS DOUBLE) * 100.0
                / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)
                AS promo_revenue,
                count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""",

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_late
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority""",

    "events_funnel" ->
      """WITH v AS (SELECT user_id,
                      MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END) AS v_ts
                    FROM events GROUP BY user_id),
         c AS (SELECT e.user_id,
                 MIN(CASE WHEN e.event_type = 'click'
                          AND epoch_ns(e.ts) >= v.v_ts
                          AND epoch_ns(e.ts) <= v.v_ts + 7200000000000 THEN epoch_ns(e.ts) END) AS c_ts
               FROM events e JOIN v ON e.user_id = v.user_id
               GROUP BY e.user_id),
         p AS (SELECT e.user_id,
                 MIN(CASE WHEN e.event_type = 'purchase'
                          AND epoch_ns(e.ts) >= c.c_ts
                          AND epoch_ns(e.ts) <= c.c_ts + 7200000000000 THEN epoch_ns(e.ts) END) AS p_ts
               FROM events e JOIN c ON e.user_id = c.user_id
               GROUP BY e.user_id)
         SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
                CASE WHEN p.p_ts IS NOT NULL THEN 3
                     WHEN c.c_ts IS NOT NULL THEN 2
                     WHEN v.v_ts IS NOT NULL THEN 1 ELSE 0 END AS reached_stage
         FROM v JOIN c ON v.user_id = c.user_id
                JOIN p ON v.user_id = p.user_id""",

    // Same pair join over epoch_ns; the division replays the identical
    // IEEE double / bigint expression.
    "events_attribution" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
                           epoch_ns(ts) AS pts, value AS pvalue
                    FROM events WHERE event_type = 'purchase'),
          c AS (SELECT user_id, event_id AS click_id, epoch_ns(ts) AS cts
                FROM events WHERE event_type = 'click'),
          pairs AS (SELECT p.user_id, p.purchase_id, p.pvalue, c.click_id
                    FROM p JOIN c ON p.user_id = c.user_id
                    WHERE c.cts < p.pts AND c.cts >= p.pts - 7200000000000)
          SELECT user_id, purchase_id, click_id,
                 pvalue / COUNT(*) OVER (PARTITION BY purchase_id) AS credit,
                 CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touch
          FROM pairs""",

    "events_retention" ->
      """WITH w AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk
                    FROM events),
         cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id)
         SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
                COUNT(DISTINCT w.user_id) AS n_active
         FROM w JOIN cohort c ON w.user_id = c.user_id
         GROUP BY c.cohort_wk, w.wk - c.cohort_wk""",

    // The hot/tail split is plan-internal — same plain equi-join result.
    "j9_split_join" ->
      """SELECT l_orderkey AS okey, l_linenumber, l_quantity, o_orderstatus
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    // The bin key is plan-internal — the result is the plain BETWEEN join.
    "j8_range_join" ->
      """SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_shipments
         FROM orders o JOIN lineitem l
           ON date_diff('day', DATE '1970-01-01', l.l_shipdate)
                BETWEEN date_diff('day', DATE '1970-01-01', o.o_orderdate)
                    AND date_diff('day', DATE '1970-01-01', o.o_orderdate) + 6
         WHERE o_orderkey % 100 = 0
         GROUP BY o_orderkey""",

    // Bins + emit-once are plan-internal — the result is the plain
    // overlap-predicate join per customer.
    "j13_interval_overlap" ->
      """WITH f AS (SELECT o_custkey AS custkey, o_orderkey AS f_key,
                       CAST(date_diff('day', DATE '1992-01-01',
                                      CAST(o_orderdate AS DATE)) AS BIGINT) AS f_lo
                    FROM orders WHERE o_orderstatus = 'F'),
          f2 AS (SELECT custkey, f_key, f_lo, f_lo + f_key % 30 + 5 AS f_hi FROM f),
          o1 AS (SELECT o_custkey AS custkey, o_orderkey AS o_key,
                       CAST(date_diff('day', DATE '1992-01-01',
                                      CAST(o_orderdate AS DATE)) AS BIGINT) AS o_lo
                 FROM orders WHERE o_orderstatus = 'O'),
          o2 AS (SELECT custkey, o_key, o_lo, o_lo + o_key % 30 + 5 AS o_hi FROM o1)
          SELECT f2.custkey, f_key, o_key,
                 least(f_hi, o_hi) - greatest(f_lo, o_lo) + 1 AS overlap_days
          FROM f2 JOIN o2 ON f2.custkey = o2.custkey
          WHERE f_lo <= o_hi AND o_lo <= f_hi""",

    "a1_distinct_union" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
         UNION
         SELECT c_custkey AS custkey FROM customer""",

    "w1_last_n" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn <= 3""",

    "w2_fill_forward" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value,
                           epoch_ns(ts) AS tsn, event_id
                    FROM events),
              dl AS (SELECT user_id, d, value AS close FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, d
                         ORDER BY tsn DESC, event_id DESC) AS rn FROM e)
                     WHERE rn = 1),
              spine AS (SELECT u.user_id, dd.d
                        FROM (SELECT DISTINCT user_id FROM e) u
                        CROSS JOIN (SELECT DISTINCT d FROM e) dd)
         SELECT s.user_id, s.d AS date,
                LAST_VALUE(dl.close IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close
         FROM spine s LEFT JOIN dl ON s.user_id = dl.user_id AND s.d = dl.d""",

    // Bounded fill replay: "rows since the last non-null" = rn − max(rn |
    // non-null) over the cumulative frame; fill only when ≤ 2.
    "w20_ffill_limit" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value,
                           epoch_ns(ts) AS tsn, event_id
                    FROM events),
              dl AS (SELECT user_id, d, value AS close FROM (
                       SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, d
                         ORDER BY tsn DESC, event_id DESC) AS rn FROM e)
                     WHERE rn = 1),
              spine AS (SELECT u.user_id, dd.d
                        FROM (SELECT DISTINCT user_id FROM e) u
                        CROSS JOIN (SELECT DISTINCT d FROM e) dd),
              j AS (SELECT s.user_id, s.d, dl.close,
                      ROW_NUMBER() OVER (PARTITION BY s.user_id ORDER BY s.d) AS rn
                    FROM spine s LEFT JOIN dl ON s.user_id = dl.user_id AND s.d = dl.d)
         SELECT user_id, d AS date,
                CASE WHEN close IS NOT NULL THEN close
                     WHEN rn - MAX(CASE WHEN close IS NOT NULL THEN rn END)
                            OVER cum <= 2
                       THEN LAST_VALUE(close IGNORE NULLS) OVER cum
                END AS close
         FROM j
         WINDOW cum AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    // Mirrors Windows.ewma(α=0.25): per-symbol date-ordered lists, the
    // recursion replayed as a list_reduce building the running list
    // (init via the leading empty-list element), s₀ = x₀,
    // step = v·0.25 + prev·0.75 — the identical IEEE tree.
    "w11_ewma" ->
      s"""$MKT, g AS (SELECT symbol,
                        list(date ORDER BY date) AS ds,
                        list(CAST(close AS DOUBLE) ORDER BY date) AS vs
                      FROM bars GROUP BY symbol),
          r AS (SELECT symbol, ds, vs,
                  list_reduce(
                    [CAST([] AS DOUBLE[])] || list_transform(vs, v -> [v]),
                    (acc, el) -> acc || [CASE WHEN len(acc) = 0 THEN el[1]
                                         ELSE el[1] * 0.25 + acc[-1] * 0.75 END]) AS run
                FROM g)
          SELECT symbol, UNNEST(ds) AS date, UNNEST(vs) AS close,
                 UNNEST(run) AS ewma
          FROM r""",

    // CUSUM: the clip-at-zero recursion replayed as a running-list fold
    // (w11_ewma pattern); integer-valued states → exact.
    "w16_cusum" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
                           CAST((event_id % 100) - 45 AS DOUBLE) AS x
                    FROM events),
          g AS (SELECT user_id,
                  list(ts_ns ORDER BY ts_ns) AS os,
                  list(x ORDER BY ts_ns) AS vs
                FROM e GROUP BY user_id),
          r AS (SELECT user_id, os, vs,
                  list_reduce(
                    [CAST([] AS DOUBLE[])] || list_transform(vs, v -> [v]),
                    (acc, el) -> acc || [GREATEST(0.0,
                      CASE WHEN len(acc) = 0 THEN el[1]
                           ELSE acc[-1] + el[1] END)]) AS run
                FROM g)
          SELECT user_id, UNNEST(os) AS ts_ns, UNNEST(vs) AS x,
                 UNNEST(run) AS cusum,
                 UNNEST(list_transform(run, s -> s > 400.0)) AS alarm
          FROM r""",

    // Same sorted-frame indexing: lower median = element (len+1)//2
    // (1-based) of the sorted trailing-5 list. Integer-only.
    "w12_rolling_median" ->
      """WITH f AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                           CAST(l_quantity AS BIGINT) AS qty
                    FROM lineitem WHERE l_suppkey % 20 = 0),
          r AS (SELECT l_suppkey, l_orderkey, l_linenumber, qty,
                       list_sort(list(qty) OVER (PARTITION BY l_suppkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber, qty
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS fr
                FROM f)
          SELECT l_suppkey, l_orderkey, l_linenumber, qty,
                 fr[(len(fr) + 1) // 2] AS med5
          FROM r""",

    "w13_sliding_distinct" ->
      """WITH f AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
                           l_partkey
                    FROM lineitem WHERE l_suppkey % 20 = 1)
          SELECT l_suppkey, l_orderkey, l_linenumber, l_partkey,
                 CAST(len(list_distinct(list(l_partkey) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS BIGINT) AS d10
          FROM f""",

    // Conditional recency replay: same flagged running max.
    "w15_since_event" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                           event_type
                    FROM events),
          r AS (SELECT user_id, event_id, event_type,
                       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
          m AS (SELECT user_id, event_id, rn,
                       MAX(CASE WHEN event_type = 'purchase' THEN rn END)
                         OVER (PARTITION BY user_id ORDER BY rn
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_p
                FROM r)
          SELECT user_id, event_id, rn - last_p AS since_purchase FROM m""",

    // Running distinct replayed the same first-occurrence way.
    "w14_running_distinct" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
          fo AS (SELECT user_id, MIN(d) AS first_d FROM e GROUP BY user_id),
          nd AS (SELECT first_d, CAST(COUNT(*) AS BIGINT) AS new_users
                 FROM fo GROUP BY first_d),
          days AS (SELECT DISTINCT d FROM e)
          SELECT days.d AS date, COALESCE(nd.new_users, 0) AS new_users,
                 CAST(SUM(COALESCE(nd.new_users, 0)) OVER (ORDER BY days.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_distinct_users
          FROM days LEFT JOIN nd ON days.d = nd.first_d""",

    "a3_a4_windows" ->
      """SELECT o_custkey, o_orderkey,
                ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS ma5,
                ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS ttm4
         FROM orders""",

    // Mirrors Windows.rollingCorr: frame lists in identical order, the
    // same left-fold sums, the same rational-form IEEE tree.
    "w10_rolling_beta" ->
      """WITH r AS (
           SELECT l_suppkey, l_orderkey, l_linenumber,
                  list(CAST(l_quantity AS DOUBLE)) OVER w AS lx,
                  list(CAST(l_extendedprice AS DOUBLE)) OVER w AS ly
           FROM lineitem
           WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
         s AS (SELECT l_suppkey, l_orderkey, l_linenumber,
                  CAST(len(lx) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lx, (a,b) -> a + b) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || ly, (a,b) -> a + b) AS sy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lx, v -> v * v), (a,b) -> a + b) AS sxx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(list_zip(lx, ly), p -> p[1] * p[2]), (a,b) -> a + b) AS sxy
               FROM r)
         SELECT l_suppkey, l_orderkey, l_linenumber,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
                END AS beta5
         FROM s""",

    "w5_rolling_corr" ->
      """WITH r AS (
           SELECT l_suppkey, l_orderkey, l_linenumber,
                  list(CAST(l_quantity AS DOUBLE)) OVER w AS lx,
                  list(CAST(l_extendedprice AS DOUBLE)) OVER w AS ly
           FROM lineitem
           WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
         s AS (SELECT l_suppkey, l_orderkey, l_linenumber,
                  CAST(len(lx) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lx, (a,b) -> a + b) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || ly, (a,b) -> a + b) AS sy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lx, v -> v * v), (a,b) -> a + b) AS sxx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(ly, v -> v * v), (a,b) -> a + b) AS syy,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(list_zip(lx, ly), p -> p[1] * p[2]), (a,b) -> a + b) AS sxy
               FROM r)
         SELECT l_suppkey, l_orderkey, l_linenumber,
                CASE WHEN nn * sxx - sx * sx > 0 AND nn * syy - sy * sy > 0
                     THEN (nn * sxy - sx * sy)
                          / (sqrt(nn * sxx - sx * sx) * sqrt(nn * syy - sy * sy))
                END AS corr5
         FROM s""",

    "w8_range_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, day,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) OVER
                  (PARTITION BY l_suppkey ORDER BY day
                   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                  AS DECIMAL(25,6)) AS DOUBLE) AS rev30
         FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                      CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                                    l_shipdate) AS BIGINT) AS day
               FROM lineitem)""",

    "set2_intersect" ->
      """SELECT c_custkey AS custkey FROM customer
         WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey FROM orders
         WHERE o_orderpriority = '1-URGENT'""",

    "set3_except_all" ->
      """SELECT l_orderkey AS okey FROM lineitem
         EXCEPT ALL
         SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'""",

    "j11_nullsafe" ->
      """SELECT k, CAST(count(*) AS BIGINT) AS n_pairs
         FROM (SELECT nullif(c_nationkey, 3) AS k FROM customer) c
         JOIN (SELECT nullif(s_nationkey, 3) AS k2 FROM supplier) s
           ON c.k IS NOT DISTINCT FROM s.k2
         GROUP BY k""",

    "text_normalize" ->
      """SELECT doc_id,
                CAST(length(norm) AS BIGINT) AS n_chars,
                md5(norm) AS norm_md5
         FROM (SELECT doc_id,
                      trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
               FROM documents)""",

    "w7_rank_family" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
                RANK() OVER w AS rnk,
                DENSE_RANK() OVER w AS drnk,
                PERCENT_RANK() OVER w AS prnk,
                CUME_DIST() OVER w AS cdist
         FROM lineitem
         WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity)""",

    "w9_lead_lag" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
                lag(l_extendedprice, 1) OVER w AS prev_price,
                lead(l_extendedprice, 1) OVER w AS next_price,
                first_value(l_extendedprice) OVER w AS first_price,
                nth_value(l_extendedprice, 3) OVER w AS third_price
         FROM lineitem
         WINDOW w AS (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity)""",

    // Mirrors Windows.rollingZscore(n=8, k=2): same fold sums, same fixed
    // z tree, division-free cross-multiplied outlier verdict.
    "w6_zscore" ->
      """WITH r AS (
           SELECT l_suppkey, l_orderkey, l_linenumber,
                  CAST(l_extendedprice AS DOUBLE) AS xv,
                  list(CAST(l_extendedprice AS DOUBLE)) OVER w AS lx
           FROM lineitem
           WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice, l_quantity
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
         s AS (SELECT l_suppkey, l_orderkey, l_linenumber, xv,
                  CAST(len(lx) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lx, (a,b) -> a + b) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lx, v -> v * v), (a,b) -> a + b) AS sxx
               FROM r)
         SELECT l_suppkey, l_orderkey, l_linenumber,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN (xv * nn - sx) / sqrt(nn * sxx - sx * sx) END AS z8,
                (nn * sxx - sx * sx > 0 AND
                 (xv * nn - sx) * (xv * nn - sx) > 4.0 * (nn * sxx - sx * sx)) AS z8_outlier
         FROM s""",

    "a6_resample_weekly" ->
      """WITH e AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS period,
                           value, epoch_ns(ts) AS tsn, event_id
                    FROM events),
              r AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY user_id, period ORDER BY tsn, event_id) AS ra,
                      ROW_NUMBER() OVER (PARTITION BY user_id, period ORDER BY tsn DESC, event_id DESC) AS rd
                    FROM e)
         SELECT user_id, period,
                MAX(CASE WHEN ra = 1 THEN value END) AS open,
                MAX(value) AS high,
                MIN(value) AS low,
                MAX(CASE WHEN rd = 1 THEN value END) AS close,
                CAST(SUM(1) AS BIGINT) AS volume,
                CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS money,
                COUNT(*) AS n_rows
         FROM r GROUP BY user_id, period""",

    "quantiles_ks_drift" -> {
      def one(bExpr: String, label: String) =
        s"""SELECT n_a, n_b, d_scaled,
                   CAST(d_scaled AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS d,
                   CAST(d_scaled AS DECIMAL(38,0)) * CAST(d_scaled AS DECIMAL(38,0)) >
                     CAST(1.844164 AS DECIMAL(38,6)) * CAST(n_a + n_b AS DECIMAL(38,0))
                       * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0)) AS drift,
                   '$label' AS pair
            FROM (
              WITH u AS (
                SELECT l_extendedprice AS v, 1 AS ca, 0 AS cb FROM lineitem
                WHERE l_returnflag = 'R'
                UNION ALL
                SELECT $bExpr AS v, 0 AS ca, 1 AS cb FROM lineitem
                WHERE l_returnflag = 'N'),
              pv AS (SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM u GROUP BY v),
              c AS (SELECT
                  SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
                  SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
                  SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
                FROM pv)
              SELECT CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
                     CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_scaled
              FROM c)"""
      one("l_extendedprice", "same") + "\n UNION ALL \n" +
        one("l_extendedprice * 1.1", "shifted")
    },

    // Mirrors Quantiles.chiSquareDrift(binWidth=5000, crit=30.1435): floor
    // binning (never a bigint cast of a double), exact BIGINT per-bin
    // counts, each contribution one fixed IEEE expression, χ² a
    // sequential fold in bin order (list_reduce, init-prepended).
    "quantiles_chi2_drift" -> {
      def one(bExpr: String, label: String) =
        s"""SELECT t.n_a, t.n_b,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pb_$label) AS n_bins,
                   (SELECT list_reduce([CAST(0 AS DOUBLE)] || list(contrib ORDER BY bin),
                                       (x, y) -> x + y) FROM c_$label) AS chi2,
                   (SELECT list_reduce([CAST(0 AS DOUBLE)] || list(contrib ORDER BY bin),
                                       (x, y) -> x + y) FROM c_$label) > 30.1435 AS drift,
                   '$label' AS pair
            FROM tt_$label t"""
      def ctes(bExpr: String, label: String) =
        s"""u_$label AS (
              SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin, 1 AS ca, 0 AS cb
              FROM lineitem WHERE l_returnflag = 'R'
              UNION ALL
              SELECT CAST(floor(($bExpr) / 5000.0) AS BIGINT), 0, 1
              FROM lineitem WHERE l_returnflag = 'N'),
            pb_$label AS (SELECT bin, CAST(SUM(ca) AS BIGINT) AS ca,
                                 CAST(SUM(cb) AS BIGINT) AS cb
                          FROM u_$label GROUP BY bin),
            tt_$label AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                                 CAST(SUM(cb) AS BIGINT) AS n_b FROM pb_$label),
            c_$label AS (SELECT bin,
                   CAST(ca * n_b - cb * n_a AS DOUBLE) * CAST(ca * n_b - cb * n_a AS DOUBLE)
                     / CAST((ca + cb) * n_a * n_b AS DOUBLE) AS contrib
                 FROM pb_$label, tt_$label)"""
      s"""WITH ${ctes("l_extendedprice", "same")},
              ${ctes("l_extendedprice * 1.1", "shifted")}
          ${one("l_extendedprice", "same")}
          UNION ALL
          ${one("l_extendedprice * 1.1", "shifted")}"""
    },

    "a9_typed_bars" ->
      """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                          epoch_ns(ts) AS tsn, event_id AS seq,
                          CAST((event_id * 37) % 10000 AS DOUBLE) AS px,
                          CAST(event_id % 100 + 1 AS BIGINT) AS qty
                   FROM events),
         w AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY tsn, seq) AS rn_a,
                 ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY tsn DESC, seq DESC) AS rn_d
               FROM t),
         agg AS (SELECT symbol, MAX(px) AS high, MIN(px) AS low,
                        CAST(SUM(qty) AS BIGINT) AS volume,
                        CAST(SUM(CAST(px AS BIGINT) * 1000000 * qty) AS BIGINT) AS turnover_micros,
                        CAST(COUNT(*) AS BIGINT) AS n_ticks
                 FROM t GROUP BY symbol)
         SELECT a.symbol, o.px AS open, a.high, a.low, c.px AS close,
                a.volume, a.turnover_micros, a.n_ticks
         FROM agg a
           JOIN (SELECT symbol, px FROM w WHERE rn_a = 1) o USING (symbol)
           JOIN (SELECT symbol, px FROM w WHERE rn_d = 1) c USING (symbol)""",

    "a8_vwap" ->
      """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                          epoch_ns(ts) // 300000000000 AS bucket,
                          CAST((event_id * 37) % 10000 AS BIGINT)
                            * CAST(event_id % 100 + 1 AS BIGINT) AS pq,
                          CAST(event_id % 100 + 1 AS BIGINT) AS q
                   FROM events)
         SELECT symbol, bucket,
                CAST(SUM(pq) AS BIGINT) AS turnover,
                CAST(SUM(q) AS BIGINT) AS volume,
                CAST(SUM(pq) AS DOUBLE) / CAST(SUM(q) AS DOUBLE) AS vwap
         FROM t GROUP BY symbol, bucket""",

    // Anchored VWAP: BIGINT running sums from the day anchor; SUM().OVER
    // on integers is order-free, so the window replay is exact.
    "a14_anchored_vwap" ->
      """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                          epoch_ns(ts) // 86400000000000 AS day,
                          epoch_ns(ts) // 300000000000 AS bucket,
                          CAST((event_id * 37) % 10000 AS BIGINT)
                            * CAST(event_id % 100 + 1 AS BIGINT) AS pq,
                          CAST(event_id % 100 + 1 AS BIGINT) AS q
                   FROM events),
           g AS (SELECT symbol, day, bucket,
                        CAST(SUM(pq) AS BIGINT) AS pq, CAST(SUM(q) AS BIGINT) AS q
                 FROM t GROUP BY symbol, day, bucket)
         SELECT symbol, day, bucket,
                CAST(SUM(pq) OVER (PARTITION BY symbol, day ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_turnover,
                CAST(SUM(q) OVER (PARTITION BY symbol, day ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_volume,
                CAST(SUM(pq) OVER (PARTITION BY symbol, day ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                / CAST(SUM(q) OVER (PARTITION BY symbol, day ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS vwap_anchored
         FROM g""",

    // Ratio-to-report: decimal-exact nation sums, decimal window total,
    // doubles only at the final casts and the one division.
    "a11_ratio_to_report" ->
      """WITH rev AS (SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS rev
             FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
             GROUP BY n_name)
         SELECT n_name, CAST(rev AS DOUBLE) AS revenue,
                CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER () AS DOUBLE) AS share
         FROM rev""",

    // Gini replay: same cents, same rank order, BIGINT-cast sums, the
    // identical final double tree.
    "a13_gini" ->
      """WITH r AS (SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
          k AS (SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents ASC, o_custkey ASC) AS BIGINT) AS rk
             FROM r),
          a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(cents) AS BIGINT) AS s,
                       CAST(SUM(rk * cents) AS BIGINT) AS wsum
                FROM k)
          SELECT n, s, wsum,
                 (2.0 * CAST(wsum AS DOUBLE)) / CAST(n * s AS DOUBLE)
                   - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
          FROM a""",

    // Pareto replay: exact cents, same ordered cumsum, BIGINT-cast window
    // sums (DuckDB widens to HUGEINT), same DIV per-mille.
    "a12_pareto" ->
      """WITH r AS (SELECT o_custkey,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
             FROM orders GROUP BY o_custkey),
          c AS (SELECT o_custkey, cents,
               CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(SUM(cents) OVER () AS BIGINT) AS total
             FROM r)
          SELECT o_custkey, cents,
                 CAST((cum * 1000) // total AS BIGINT) AS cum_share_pm,
                 (cum * 1000) // total <= 800 AS in_top80
          FROM c""",

    // Streak replay: identical break-flag CASE, cumulative island id,
    // per-island row counts. arg_max picks the FINAL island (ids are
    // unique per key so there's no tie to break).
    "a10_streaks" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, value
                    FROM events),
          f AS (SELECT user_id, ts_ns, event_id,
                       CASE WHEN lag(value) OVER w IS NULL
                                 OR value <= lag(value) OVER w
                            THEN 1 ELSE 0 END AS brk
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)),
          s AS (SELECT user_id,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak
                FROM f),
          l AS (SELECT user_id, streak, CAST(COUNT(*) AS BIGINT) AS len
                FROM s GROUP BY user_id, streak)
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
                 MAX(len) AS max_streak,
                 arg_max(len, streak) AS last_streak
          FROM l GROUP BY user_id""",

    "a7_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
                count(*) AS n_rows,
                MIN(l_extendedprice) AS min_price,
                MAX(l_extendedprice) AS max_price
         FROM lineitem GROUP BY 1""",

    "a6_resample_minute" ->
      """WITH e AS (SELECT epoch_ns(ts) // 300000000000 AS period,
                           value, epoch_ns(ts) AS tsn, event_id
                    FROM events),
              r AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY period ORDER BY tsn, event_id) AS ra,
                      ROW_NUMBER() OVER (PARTITION BY period ORDER BY tsn DESC, event_id DESC) AS rd
                    FROM e)
         SELECT period,
                MAX(CASE WHEN ra = 1 THEN value END) AS open,
                MAX(value) AS high,
                MIN(value) AS low,
                MAX(CASE WHEN rd = 1 THEN value END) AS close,
                CAST(SUM(1) AS BIGINT) AS volume,
                CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS money,
                COUNT(*) AS n_rows
         FROM r GROUP BY period""",

    // Mirrors Relevance.hashedLinearScore(dims=64, bias=1): the same
    // md5-hex→BIGINT bucket formula as emb_rand_proj, weight = b%7−3,
    // integer sum over word occurrences.
    "text_classify" ->
      """WITH w AS (SELECT doc_id,
                           unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS word
                    FROM documents),
         s AS (SELECT doc_id,
                      CAST(SUM((CAST('0x' || substring(md5(word),1,15) AS BIGINT) % 64) % 7 - 3)
                           AS BIGINT) AS ws
               FROM w GROUP BY doc_id)
         SELECT d.doc_id, COALESCE(s.ws, 0) + 1 AS score,
                (COALESCE(s.ws, 0) + 1) > 0 AS positive
         FROM documents d LEFT JOIN s USING (doc_id)""",

    "text_quality" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents)
         SELECT doc_id,
                CAST(len(ws) AS BIGINT) AS n_words,
                CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS total_chars,
                ROUND(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / CAST(len(ws) AS DOUBLE), 6) AS avg_word_len,
                CASE WHEN len(ws) > 0 THEN
                  ROUND(CAST(len(list_filter(ws, x -> x IN ('the','a','of','and','is'))) AS DOUBLE) / CAST(len(ws) AS DOUBLE), 6)
                END AS stop_ratio
         FROM w""",

    // Same integer sufficient statistics; the score constants use the e0
    // DOUBLE-literal form (bare decimals parse as DECIMAL in DuckDB and
    // convert with incorrect rounding — the ann_ndcg_eval lesson).
    "text_readability" ->
      """WITH w AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
                    FROM documents),
          s AS (SELECT doc_id,
                  CAST(len(ws) AS BIGINT) AS n_words,
                  CAST((len(ws) + 7) // 8 AS BIGINT) AS n_sentences,
                  CAST(list_reduce([0] || list_transform(ws,
                         x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1)),
                       (a, b) -> a + b) AS BIGINT) AS n_syllables
                FROM w)
          SELECT doc_id, n_words, n_sentences, n_syllables,
                 CASE WHEN n_words > 0 THEN
                   206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                     - 84.6e0 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                 END AS flesch,
                 CASE WHEN n_words > 0 THEN
                   0.39e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                     + 11.8e0 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
                     - 15.59e0
                 END AS fk_grade
          FROM s""",

    "text_langid" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         s AS (SELECT doc_id,
                 len(list_filter(ws, x -> x='der'))+len(list_filter(ws, x -> x='die'))+len(list_filter(ws, x -> x='das'))+len(list_filter(ws, x -> x='und'))+len(list_filter(ws, x -> x='nicht')) AS s_de,
                 len(list_filter(ws, x -> x='the'))+len(list_filter(ws, x -> x='a'))+len(list_filter(ws, x -> x='of'))+len(list_filter(ws, x -> x='and'))+len(list_filter(ws, x -> x='is')) AS s_en,
                 len(list_filter(ws, x -> x='el'))+len(list_filter(ws, x -> x='los'))+len(list_filter(ws, x -> x='las'))+len(list_filter(ws, x -> x='una'))+len(list_filter(ws, x -> x='que')) AS s_es,
                 len(list_filter(ws, x -> x='le'))+len(list_filter(ws, x -> x='les'))+len(list_filter(ws, x -> x='et'))+len(list_filter(ws, x -> x='une'))+len(list_filter(ws, x -> x='est')) AS s_fr,
                 len(list_filter(ws, x -> x='的'))+len(list_filter(ws, x -> x='是'))+len(list_filter(ws, x -> x='在'))+len(list_filter(ws, x -> x='了'))+len(list_filter(ws, x -> x='和')) AS s_zh
               FROM w)
         SELECT doc_id,
                CASE WHEN s_de=mx THEN 'de' WHEN s_en=mx THEN 'en' WHEN s_es=mx THEN 'es'
                     WHEN s_fr=mx THEN 'fr' WHEN s_zh=mx THEN 'zh' END AS lang_pred,
                CAST(s_en AS BIGINT) AS en_score
         FROM (SELECT *, greatest(s_de,s_en,s_es,s_fr,s_zh) AS mx FROM s)""",

    "text_tokens" ->
      """SELECT doc_id,
                CAST(len(list_filter(string_split(text,' '), x -> length(x)>0)) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens
         FROM documents""",

    // Replays train-then-encode end to end: gram counts → top-200 cut
    // (count DESC, token ASC — total order) → per-position longest match →
    // the greedy walk as a recursive CTE over precomputed jump lengths
    // (pos → pos + mlen). MATERIALIZED pins pg/m so the recursion doesn't
    // re-derive them per iteration. All-integer + string equality — exact.
    "tok_subword" ->
      """WITH RECURSIVE d AS MATERIALIZED (
           SELECT doc_id, text AS t, length(text) AS len FROM documents),
         pos AS (SELECT doc_id, t, len, CAST(i AS INT) AS i
                 FROM d, unnest(range(1, len + 1)) AS u(i)),
         pg AS MATERIALIZED (
           SELECT p.doc_id, p.i, CAST(n AS INT) AS n,
                  substr(p.t, p.i, CAST(n AS INT)) AS g
           FROM pos p, unnest([2,3,4]) AS nn(n)
           WHERE p.i + n - 1 <= p.len),
         vocab AS MATERIALIZED (
           SELECT g AS token, COUNT(*) AS c FROM pg GROUP BY g
           ORDER BY c DESC, g ASC LIMIT 200),
         m AS MATERIALIZED (
           SELECT pg.doc_id, pg.i, MAX(pg.n) AS mlen
           FROM pg JOIN vocab v ON pg.g = v.token
           GROUP BY pg.doc_id, pg.i),
         w AS (SELECT doc_id, 1 AS pos, CAST(0 AS BIGINT) AS n_tok,
                      CAST(0 AS BIGINT) AS n_multi, len FROM d
               UNION ALL
               SELECT w.doc_id, w.pos + COALESCE(m.mlen, 1), w.n_tok + 1,
                      w.n_multi + CASE WHEN COALESCE(m.mlen, 1) > 1
                                       THEN 1 ELSE 0 END, w.len
               FROM w LEFT JOIN m ON m.doc_id = w.doc_id AND m.i = w.pos
               WHERE w.pos <= w.len),
         agg AS (SELECT doc_id, MAX(n_tok) AS n_tokens,
                        MAX(n_multi) AS n_multi FROM w GROUP BY doc_id)
         SELECT a.doc_id, a.n_tokens, a.n_multi,
                CASE WHEN d.len = 0 THEN ''
                     ELSE substr(d.t, 1, COALESCE(m1.mlen, 1)) END AS first_token
         FROM agg a JOIN d ON d.doc_id = a.doc_id
         LEFT JOIN m m1 ON m1.doc_id = a.doc_id AND m1.i = 1""",

    "text_fingerprint" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents)
         SELECT doc_id,
                list_reduce([CAST(0 AS BIGINT)] || list_transform(ws, x -> CAST(length(x)*131 + ord(substr(x,1,1)) AS BIGINT)),
                            (a,b) -> (a*31+b) % 1000000007) AS fp
         FROM w""",

    // Mirrors Relevance.tfIdfTopTerms: rational IDF tf·(N/df) — the same
    // raw double product/quotient tree, so scores are bit-identical.
    "text_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         nn AS (SELECT COUNT(*) AS n FROM documents),
         sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(tf.tf AS DOUBLE) * (CAST(nn.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
                FROM tf JOIN df USING (term) CROSS JOIN nn)
         SELECT doc_id, term, tf, df, tfidf, rank FROM (
           SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
           FROM sc)
         WHERE rank <= 3""",

    // Mirrors Relevance.bm25(terms = data, query, spark; k1 = 1.2,
    // b = 0.75). Constants written as the same arithmetic as the Scala
    // plan (1.2 + 1.0, never 2.2) so both engines fold identical doubles;
    // components sum left-to-right in term order.
    "text_search_topk" -> searchTopKOracle,

    "text_bm25" -> {
      def comp(t: String): String =
        s"""((CAST(n AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)
            * (CAST(tf_$t AS DOUBLE) * (1.2 + 1.0))
            / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))"""
      s"""WITH base AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text,' '), x -> length(x)>0)) AS BIGINT) AS dl,
             CAST(len(list_filter(string_split(text,' '), x -> x = 'data')) AS BIGINT) AS tf_data,
             CAST(len(list_filter(string_split(text,' '), x -> x = 'query')) AS BIGINT) AS tf_query,
             CAST(len(list_filter(string_split(text,' '), x -> x = 'spark')) AS BIGINT) AS tf_spark
           FROM documents),
         stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl,
             SUM(CASE WHEN tf_data > 0 THEN 1 ELSE 0 END) AS df_data,
             SUM(CASE WHEN tf_query > 0 THEN 1 ELSE 0 END) AS df_query,
             SUM(CASE WHEN tf_spark > 0 THEN 1 ELSE 0 END) AS df_spark
           FROM base)
         SELECT doc_id, dl, tf_data, tf_query, tf_spark,
                ${comp("data")} + ${comp("query")} + ${comp("spark")} AS bm25
         FROM base CROSS JOIN stats"""
    },

    // Mirrors Chunker.chunkByTokens(32, 8): starts 0, 24, 48, … < n_words;
    // DuckDB list slice l[a:b] is 1-based inclusive = slice(ws, a, 32)
    // with b = a+31, both clamp at the array end.
    "text_chunks" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         st AS (SELECT doc_id, ws, CAST(j AS BIGINT) // 24 AS chunk_id,
                       ws[CAST(j AS BIGINT)+1 : CAST(j AS BIGINT)+32] AS chunk
                FROM w, unnest(range(0, len(ws), 24)) AS t(j)
                WHERE len(ws) > 0)
         SELECT doc_id, chunk_id,
                CAST(len(chunk) AS BIGINT) AS n_tokens,
                array_to_string(chunk, ' ') AS chunk_text
         FROM st""",

    // Mirrors Packer.packGreedy(cap 100, buckets 8) over the same chunks:
    // the greedy fold (overflow closes the bin) replayed one rank at a
    // time with a recursive CTE, per bucket.
    "pack_chunks" ->
      """WITH RECURSIVE w AS (
           SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
           FROM documents),
         ch0 AS (SELECT doc_id, CAST(j AS BIGINT) // 24 AS chunk_id,
                        CAST(len(ws[CAST(j AS BIGINT)+1 : CAST(j AS BIGINT)+32]) AS BIGINT) AS n_tokens
                 FROM w, unnest(range(0, len(ws), 24)) AS t(j)
                 WHERE len(ws) > 0),
         ch AS (SELECT doc_id, chunk_id, n_tokens, doc_id % 8 AS bucket,
                       row_number() OVER (PARTITION BY doc_id % 8
                                          ORDER BY doc_id, chunk_id) AS rn
                FROM ch0),
         pack AS (
           SELECT bucket, rn, doc_id, chunk_id, n_tokens,
                  CAST(0 AS BIGINT) AS bin, n_tokens AS fill
           FROM ch WHERE rn = 1
           UNION ALL
           SELECT c.bucket, c.rn, c.doc_id, c.chunk_id, c.n_tokens,
                  CASE WHEN p.fill + c.n_tokens > 100 THEN p.bin + 1 ELSE p.bin END,
                  CASE WHEN p.fill + c.n_tokens > 100 THEN c.n_tokens
                       ELSE p.fill + c.n_tokens END
           FROM pack p JOIN ch c ON c.bucket = p.bucket AND c.rn = p.rn + 1)
         SELECT doc_id, chunk_id, n_tokens, bucket, bin,
                bucket * 1000000 + bin AS bin_id
         FROM pack""",

    // Mirrors Decontam.ngramOverlap(n = 5, bench = doc_id % 50 == 0):
    // distinct 5-grams per doc, LEFT JOIN the distinct bench gram set,
    // integer hit counts and one IEEE division.
    "decontam_bloom" -> bloomDecontamOracle,

    // Replays the broadcast cosine pass: per corpus vector, the max
    // rounded fold-cosine against the bench slice (monotone round ⇒ MAX
    // commutes; fold order matches the Spark side — proven by ann_topk).
    "decontam_semantic" ->
      """WITH b AS (SELECT embedding AS bv FROM embeddings WHERE vec_id % 100 = 0),
         s AS (SELECT e.vec_id,
                 ROUND(
                   list_reduce(list_transform(list_zip(e.embedding, b.bv), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)
                   / (sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
                    * sqrt(list_reduce(list_transform(b.bv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))), 6) AS cos
               FROM embeddings e, b)
         SELECT vec_id, MAX(cos) AS max_cos,
                MAX(cos) >= 0.8 AS contaminated
         FROM s GROUP BY vec_id""",
    // Replays the blocking exactly: bench re-keyed dense, value-predicate
    // centroid seeds, argmin cell assignment, per-corpus-row top-2 probe,
    // candidates = probed cells' members, then the same max/threshold.
    "decontam_sem_blocked" ->
      s"""WITH b AS (SELECT vec_id // 100 AS bid, embedding AS bv
                     FROM embeddings WHERE vec_id % 100 = 0),
         par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 4) AS stride FROM b),
         cent AS (SELECT bid AS centroid_id, bv AS centroid FROM b, par
                  WHERE bid % stride = 0 AND bid < stride * 4),
         bcell AS (SELECT bid, bv, centroid_id FROM (
             SELECT b.bid, b.bv, cent.centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY b.bid
                      ORDER BY -${cosSql("b.bv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
             FROM b CROSS JOIN cent) WHERE rn = 1),
         probe AS (SELECT vec_id, cv, centroid_id FROM (
             SELECT e.vec_id, e.embedding AS cv, cent.centroid_id,
                    ROW_NUMBER() OVER (PARTITION BY e.vec_id
                      ORDER BY -${cosSql("e.embedding", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
             FROM embeddings e CROSS JOIN cent) WHERE pr <= 2),
         cand AS (SELECT p.vec_id, ROUND(${cosSql("p.cv", "bc.bv")}, 6) AS cos
                  FROM probe p JOIN bcell bc USING (centroid_id))
         SELECT vec_id, MAX(cos) AS max_cos,
                MAX(cos) >= 0.8 AS contaminated
         FROM cand GROUP BY vec_id""",

    "cms_ngram_counts" -> cmsOracle,

    "cms_heavy_hitters" -> heavyHittersOracle,

    // The JSONL round trip must surface exactly what parquet holds.
    "jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    "orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    // Replays both lifecycle snapshots from the fixture: v0 = the base
    // projection, v1 = base with the k%10=3 batch's price revised (the
    // last-wins upsert where batch keys ⊆ base keys ≡ a CASE update).
    "table_lifecycle" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price,
                              CAST(date_part('year', o_orderdate) AS BIGINT) AS y
                       FROM orders)
         SELECT CAST(0 AS BIGINT) AS version, k, price, y FROM base
         UNION ALL
         SELECT CAST(1 AS BIGINT) AS version, k,
                CASE WHEN k % 10 = 3 THEN price * 1.1 ELSE price END AS price, y
         FROM base""",

    "csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    "jsonl_zstd_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    // HLL++ bound check: exact cardinality + the expectation the sketch
    // landed inside the tolerance (quantiles_approx pattern).
    "hll_distinct" ->
      """SELECT l_returnflag,
                CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
                TRUE AS within_bound
         FROM lineitem GROUP BY l_returnflag""",

    "decontam_ngram" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT doc_id, list_distinct(list_transform(range(0, len(ws)-4),
                        i -> array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+5], ' '))) AS grams
               FROM w WHERE len(ws) >= 5),
         e AS (SELECT doc_id, unnest(grams) AS shingle FROM g),
         b AS (SELECT DISTINCT shingle FROM e WHERE doc_id % 50 = 0)
         SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
                CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS contam_frac
         FROM e LEFT JOIN b ON e.shingle = b.shingle
         GROUP BY e.doc_id""",

    // Mirrors Dedup.dedupSegments(segSize 8): disjoint 8-token windows,
    // first occurrence per distinct segment = row_number over
    // (doc_id, chunk_id), rebuild with order-preserving string_agg.
    // CDC: same md5-first-byte window test, boundaries [0]||bnd||[n],
    // 1-based inclusive slices == Spark's slice(ws, lo+1, hi-lo).
    "dedup_cdc_chunks" ->
      """WITH w AS (SELECT doc_id,
               list_filter(string_split(text,' '), x -> length(x)>0) AS ws
             FROM documents),
          b0 AS (SELECT doc_id, ws, len(ws) AS n,
                   CASE WHEN len(ws) - 1 >= 4 THEN
                     list_filter(range(4, len(ws)), i ->
                       CAST('0x' || substring(md5(array_to_string(ws[i-3:i], ' ')), 1, 2) AS INT) % 16 = 0)
                   ELSE [] END AS bnd
                 FROM w),
          b1 AS (SELECT doc_id, ws, [0] || bnd || [n] AS b FROM b0),
          c AS (SELECT doc_id,
                  CAST(j - 1 AS BIGINT) AS chunk_idx,
                  CAST(b[j+1] - b[j] AS BIGINT) AS n_words,
                  md5(array_to_string(ws[b[j]+1 : b[j+1]], ' ')) AS chunk_md5
                FROM b1, unnest(range(1, len(b))) AS t(j)),
          f AS (SELECT * FROM c WHERE n_words > 0)
          SELECT doc_id, chunk_idx, n_words, chunk_md5,
                 CAST(COUNT(*) OVER (PARTITION BY chunk_md5) AS BIGINT) AS n_copies
          FROM f""",

    "dedup_segments" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         st AS (SELECT doc_id, CAST(j AS BIGINT) // 8 AS chunk_id,
                       CAST(len(ws[CAST(j AS BIGINT)+1 : CAST(j AS BIGINT)+8]) AS BIGINT) AS n_tokens,
                       array_to_string(ws[CAST(j AS BIGINT)+1 : CAST(j AS BIGINT)+8], ' ') AS chunk_text
                FROM w, unnest(range(0, len(ws), 8)) AS t(j)
                WHERE len(ws) > 0),
         keep AS (SELECT doc_id, chunk_id, n_tokens, chunk_text,
                         row_number() OVER (PARTITION BY chunk_text
                                            ORDER BY doc_id, chunk_id) AS rn
                  FROM st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept,
                string_agg(chunk_text, ' ' ORDER BY chunk_id) AS cleaned_text
         FROM keep WHERE rn = 1 GROUP BY doc_id""",

    // Mirrors DataQuality.repetitionSignals: row-local word stats, bigram
    // counts via unnest + two-level grouping, IEEE divisions of exact ints.
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         base AS (SELECT doc_id,
                         CAST(len(ws) AS BIGINT) AS n_words,
                         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
                         CAST(len(ws) - 1 AS BIGINT) AS n_bigrams,
                         list_transform(range(0, len(ws)-1),
                           i -> ws[CAST(i AS BIGINT)+1] || ' ' || ws[CAST(i AS BIGINT)+2]) AS bigrams
                  FROM w WHERE len(ws) >= 2),
         e AS (SELECT doc_id, n_words, n_distinct_words, n_bigrams, unnest(bigrams) AS g FROM base),
         c AS (SELECT doc_id, n_words, n_distinct_words, n_bigrams, g, count(*) AS cnt
               FROM e GROUP BY doc_id, n_words, n_distinct_words, n_bigrams, g)
         SELECT doc_id, n_words, n_distinct_words, n_bigrams,
                CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
                CAST(max(cnt) AS BIGINT) AS top_bigram_cnt,
                CAST(1 AS DOUBLE) - CAST(n_distinct_words AS DOUBLE) / n_words AS dup_word_frac,
                CAST(max(cnt) AS DOUBLE) / n_bigrams AS top_bigram_frac
         FROM c GROUP BY doc_id, n_words, n_distinct_words, n_bigrams""",

    // Mirrors LangModel.bigramScore (self-scored): bigram counts, head
    // counts off the aggregated model, one IEEE division per bigram, and a
    // sequential fold of p in position order (list_reduce init prepended
    // per DuckDB 1.0).
    "lm_bigram_score" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         bg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       ws[CAST(i AS BIGINT)+1] AS w1, ws[CAST(i AS BIGINT)+2] AS w2
                FROM w, unnest(range(0, len(ws)-1)) AS t(i)
                WHERE len(ws) >= 2),
         model AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_cnt FROM bg GROUP BY w1, w2),
         heads AS (SELECT w1, CAST(sum(bg_cnt) AS BIGINT) AS head_cnt FROM model GROUP BY w1),
         pm AS (SELECT w1, w2, CAST(bg_cnt AS DOUBLE) / CAST(head_cnt AS DOUBLE) AS p
                FROM model JOIN heads USING (w1)),
         pr AS (SELECT doc_id, pos, p FROM bg JOIN pm USING (w1, w2))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                list_reduce([CAST(0 AS DOUBLE)] || list(p ORDER BY pos), (a, x) -> a + x)
                  / CAST(count(*) AS DOUBLE) AS lm_score
         FROM pr GROUP BY doc_id""",

    // Same lm_score derivation as lm_bigram_score, then nearest-rank
    // quartile cuts and the row-local bucket compare. The cuts are
    // SELECTED input values and lm_score is bit-exact (proven by the lm
    // oracle), so the > comparisons agree across engines.
    "lm_buckets" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         bg AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       ws[CAST(i AS BIGINT)+1] AS w1, ws[CAST(i AS BIGINT)+2] AS w2
                FROM w, unnest(range(0, len(ws)-1)) AS t(i)
                WHERE len(ws) >= 2),
         model AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_cnt FROM bg GROUP BY w1, w2),
         heads AS (SELECT w1, CAST(sum(bg_cnt) AS BIGINT) AS head_cnt FROM model GROUP BY w1),
         pm AS (SELECT w1, w2, CAST(bg_cnt AS DOUBLE) / CAST(head_cnt AS DOUBLE) AS p
                FROM model JOIN heads USING (w1)),
         pr AS (SELECT doc_id, pos, p FROM bg JOIN pm USING (w1, w2)),
         score AS (SELECT doc_id,
                    list_reduce([CAST(0 AS DOUBLE)] || list(p ORDER BY pos), (a, x) -> a + x)
                      / CAST(count(*) AS DOUBLE) AS lm_score
                   FROM pr GROUP BY doc_id),
         r AS (SELECT lm_score AS v,
                      CAST(ROW_NUMBER() OVER (ORDER BY lm_score) AS BIGINT) AS rn,
                      CAST(COUNT(*) OVER () AS BIGINT) AS n
               FROM score),
         cuts AS (SELECT
                    MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.25) AS BIGINT) THEN v END) AS p25,
                    MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) THEN v END) AS p50,
                    MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.75) AS BIGINT) THEN v END) AS p75
                  FROM r)
         SELECT doc_id, lm_score,
                CAST(1 + (CASE WHEN lm_score > p25 THEN 1 ELSE 0 END)
                       + (CASE WHEN lm_score > p50 THEN 1 ELSE 0 END)
                       + (CASE WHEN lm_score > p75 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
         FROM score, cuts""",

    // The penalizeUnseen variant: model restricted to the bench slice,
    // denominator = the doc's TOTAL bigram count (len(ws) − 1), unseen
    // mass scoring zero. n_bigrams stays the covered count.
    "lm_bigram_xscore" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         bg AS (SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_total,
                       CAST(i AS BIGINT) AS pos,
                       ws[CAST(i AS BIGINT)+1] AS w1, ws[CAST(i AS BIGINT)+2] AS w2
                FROM w, unnest(range(0, len(ws)-1)) AS t(i)
                WHERE len(ws) >= 2),
         model AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS bg_cnt FROM bg
                   WHERE doc_id % 50 = 0 GROUP BY w1, w2),
         heads AS (SELECT w1, CAST(sum(bg_cnt) AS BIGINT) AS head_cnt FROM model GROUP BY w1),
         pm AS (SELECT w1, w2, CAST(bg_cnt AS DOUBLE) / CAST(head_cnt AS DOUBLE) AS p
                FROM model JOIN heads USING (w1)),
         pr AS (SELECT doc_id, n_total, pos, p FROM bg JOIN pm USING (w1, w2))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                list_reduce([CAST(0 AS DOUBLE)] || list(p ORDER BY pos), (a, x) -> a + x)
                  / CAST(min(n_total) AS DOUBLE) AS lm_score
         FROM pr GROUP BY doc_id""",

    // Mirrors the corpus_gate composition — the langid / repetition /
    // decontam fragments above, joined on doc_id, one boolean verdict.
    "corpus_gate" ->
      """WITH w AS (SELECT doc_id, lang, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         tok AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_tokens FROM w),
         ls AS (SELECT doc_id,
                 len(list_filter(ws, x -> x='der'))+len(list_filter(ws, x -> x='die'))+len(list_filter(ws, x -> x='das'))+len(list_filter(ws, x -> x='und'))+len(list_filter(ws, x -> x='nicht')) AS s_de,
                 len(list_filter(ws, x -> x='the'))+len(list_filter(ws, x -> x='a'))+len(list_filter(ws, x -> x='of'))+len(list_filter(ws, x -> x='and'))+len(list_filter(ws, x -> x='is')) AS s_en,
                 len(list_filter(ws, x -> x='el'))+len(list_filter(ws, x -> x='los'))+len(list_filter(ws, x -> x='las'))+len(list_filter(ws, x -> x='una'))+len(list_filter(ws, x -> x='que')) AS s_es,
                 len(list_filter(ws, x -> x='le'))+len(list_filter(ws, x -> x='les'))+len(list_filter(ws, x -> x='et'))+len(list_filter(ws, x -> x='une'))+len(list_filter(ws, x -> x='est')) AS s_fr,
                 len(list_filter(ws, x -> x='的'))+len(list_filter(ws, x -> x='是'))+len(list_filter(ws, x -> x='在'))+len(list_filter(ws, x -> x='了'))+len(list_filter(ws, x -> x='和')) AS s_zh
               FROM w),
         lid AS (SELECT doc_id,
                 CASE WHEN s_de=mx THEN 'de' WHEN s_en=mx THEN 'en' WHEN s_es=mx THEN 'es'
                      WHEN s_fr=mx THEN 'fr' WHEN s_zh=mx THEN 'zh' END AS lang_pred
                 FROM (SELECT *, greatest(s_de,s_en,s_es,s_fr,s_zh) AS mx FROM ls)),
         rb AS (SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_bigrams,
                       list_transform(range(0, len(ws)-1),
                         i -> ws[CAST(i AS BIGINT)+1] || ' ' || ws[CAST(i AS BIGINT)+2]) AS bigrams
                FROM w WHERE len(ws) >= 2),
         re AS (SELECT doc_id, n_bigrams, unnest(bigrams) AS g FROM rb),
         rc AS (SELECT doc_id, n_bigrams, g, count(*) AS cnt FROM re GROUP BY doc_id, n_bigrams, g),
         rep AS (SELECT doc_id, CAST(max(cnt) AS DOUBLE) / n_bigrams AS top_bigram_frac
                 FROM rc GROUP BY doc_id, n_bigrams),
         dg AS (SELECT doc_id, list_distinct(list_transform(range(0, len(ws)-4),
                        i -> array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+5], ' '))) AS grams
               FROM w WHERE len(ws) >= 5),
         de AS (SELECT doc_id, unnest(grams) AS shingle FROM dg),
         db AS (SELECT DISTINCT shingle FROM de WHERE doc_id % 50 = 0),
         con AS (SELECT de.doc_id,
                        CAST(sum(CASE WHEN db.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
                 FROM de LEFT JOIN db ON de.shingle = db.shingle
                 GROUP BY de.doc_id)
         SELECT t.doc_id, t.lang, t.n_tokens, lid.lang_pred, rep.top_bigram_frac,
                COALESCE(con.n_contaminated, 0) AS n_contaminated,
                COALESCE(t.n_tokens >= 20 AND lid.lang_pred = t.lang
                         AND rep.top_bigram_frac <= CAST(0.05 AS DOUBLE)
                         AND COALESCE(con.n_contaminated, 0) = 0, FALSE) AS keep
         FROM tok t
         LEFT JOIN lid USING (doc_id)
         LEFT JOIN rep USING (doc_id)
         LEFT JOIN con USING (doc_id)""",

    // Batch semantics of the streaming gate's one-batch replay: the
    // watermark never advances, so streaming dedup ≡ DISTINCT text, and
    // every emitted column is text-derived (duplicate-invariant).
    "stream_corpus_gate" ->
      """WITH d AS (SELECT DISTINCT text FROM documents),
         w AS (SELECT text, list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws FROM d),
         ls AS (SELECT text,
                 len(list_filter(ws, x -> x='der'))+len(list_filter(ws, x -> x='die'))+len(list_filter(ws, x -> x='das'))+len(list_filter(ws, x -> x='und'))+len(list_filter(ws, x -> x='nicht')) AS s_de,
                 len(list_filter(ws, x -> x='the'))+len(list_filter(ws, x -> x='a'))+len(list_filter(ws, x -> x='of'))+len(list_filter(ws, x -> x='and'))+len(list_filter(ws, x -> x='is')) AS s_en,
                 len(list_filter(ws, x -> x='el'))+len(list_filter(ws, x -> x='los'))+len(list_filter(ws, x -> x='las'))+len(list_filter(ws, x -> x='una'))+len(list_filter(ws, x -> x='que')) AS s_es,
                 len(list_filter(ws, x -> x='le'))+len(list_filter(ws, x -> x='les'))+len(list_filter(ws, x -> x='et'))+len(list_filter(ws, x -> x='une'))+len(list_filter(ws, x -> x='est')) AS s_fr,
                 len(list_filter(ws, x -> x='的'))+len(list_filter(ws, x -> x='是'))+len(list_filter(ws, x -> x='在'))+len(list_filter(ws, x -> x='了'))+len(list_filter(ws, x -> x='和')) AS s_zh
               FROM w),
         lid AS (SELECT text,
                 CASE WHEN s_de=mx THEN 'de' WHEN s_en=mx THEN 'en' WHEN s_es=mx THEN 'es'
                      WHEN s_fr=mx THEN 'fr' WHEN s_zh=mx THEN 'zh' END AS lang_guess
                 FROM (SELECT *, greatest(s_de,s_en,s_es,s_fr,s_zh) AS mx FROM ls)),
         sig AS (SELECT w.text,
                   CAST(len(w.ws) AS BIGINT) AS n_tokens,
                   CASE WHEN len(w.ws) > 0
                        THEN CAST(len(w.ws) - len(list_distinct(w.ws)) AS DOUBLE) / len(w.ws)
                        ELSE CAST(0.0 AS DOUBLE) END AS dup_word_frac
                 FROM w)
         SELECT md5(sig.text) AS content_hash,
                CAST(length(sig.text) AS BIGINT) AS content_len,
                sig.n_tokens, lid.lang_guess, sig.dup_word_frac,
                (sig.n_tokens >= 5 AND sig.dup_word_frac <= CAST(0.5 AS DOUBLE)
                 AND lid.lang_guess IS NOT NULL) AS keep
         FROM sig JOIN lid USING (text)""",

    // Batch range join ≡ the one-batch streaming interval join (inner,
    // nothing late-dropped): micros via integer division, inclusive bounds.
    "stream_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events)
         SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id
         FROM e l JOIN e r ON l.user_id = r.user_id
           AND r.us BETWEEN l.us AND l.us + 600000000
         WHERE l.event_id % 100 = 0""",

    // LEFT OUTER interval join: the inner matches plus null-extended left
    // rows — a left row emits unmatched only when the final watermark
    // (min over both inputs of max-event-ms − 600 s, ms precision) passed
    // its window END strictly; later rows stay buffered in state, exactly
    // the streaming semantics (stream_bars cutoff precedent). Calibrated
    // against the replay dump: one fixture left row sits past the cutoff.
    "stream_interval_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_ns(ts) // 1000 AS us FROM events),
         l AS (SELECT user_id, us AS lus, event_id AS left_id
               FROM e WHERE event_id % 100 = 0),
         r AS (SELECT user_id, us AS rus, event_id AS right_id
               FROM e WHERE event_type = 'purchase'),
         wm AS (SELECT LEAST((SELECT MAX(lus) // 1000 FROM l),
                             (SELECT MAX(rus) // 1000 FROM r)) - 600000 AS wm_ms),
         matched AS (SELECT l.user_id, l.left_id, r.right_id
                     FROM l JOIN r ON l.user_id = r.user_id
                      AND r.rus >= l.lus AND r.rus <= l.lus + 600000000),
         unmatched AS (SELECT l.user_id, l.left_id,
                              CAST(NULL AS BIGINT) AS right_id
                       FROM l, wm
                       WHERE NOT EXISTS (SELECT 1 FROM r
                            WHERE r.user_id = l.user_id
                              AND r.rus >= l.lus AND r.rus <= l.lus + 600000000)
                         AND (l.lus + 600000000) // 1000 < wm.wm_ms)
         SELECT * FROM matched UNION ALL SELECT * FROM unmatched""",

    // Full-outer replay: the left cutoff is the window END, the right
    // cutoff is the row's OWN time (its matchers are at-or-before it).
    "stream_interval_full" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
                           epoch_ns(ts) // 1000 AS us FROM events),
         l AS (SELECT user_id, us AS lus, event_id AS left_id
               FROM e WHERE event_id % 100 = 0),
         r AS (SELECT user_id, us AS rus, event_id AS right_id
               FROM e WHERE event_type = 'purchase' AND event_id % 20 = 0),
         wm AS (SELECT LEAST((SELECT MAX(lus) // 1000 FROM l),
                             (SELECT MAX(rus) // 1000 FROM r)) - 600000 AS wm_ms),
         matched AS (SELECT l.user_id, l.left_id, r.right_id
                     FROM l JOIN r ON l.user_id = r.user_id
                      AND r.rus >= l.lus AND r.rus <= l.lus + 600000000),
         unl AS (SELECT l.user_id, l.left_id,
                        CAST(NULL AS BIGINT) AS right_id
                 FROM l, wm
                 WHERE NOT EXISTS (SELECT 1 FROM r
                      WHERE r.user_id = l.user_id
                        AND r.rus >= l.lus AND r.rus <= l.lus + 600000000)
                   AND (l.lus + 600000000) // 1000 < wm.wm_ms),
         unr AS (SELECT r.user_id, CAST(NULL AS BIGINT) AS left_id, r.right_id
                 FROM r, wm
                 WHERE NOT EXISTS (SELECT 1 FROM l
                      WHERE l.user_id = r.user_id
                        AND r.rus >= l.lus AND r.rus <= l.lus + 600000000)
                   AND r.rus // 1000 < wm.wm_ms)
         SELECT * FROM matched
         UNION ALL SELECT * FROM unl
         UNION ALL SELECT * FROM unr""",

    // Streaming bar builder: batch OHLCV over the same derived ticks,
    // filtered to windows the final watermark passed (append-mode emission:
    // watermark ms = floor(max event-time µs / 1000) − 601000; a window
    // emits when its end ≤ watermark). Integer-valued px/qty make every
    // sum order-free exact; open/close replay min_by/max_by(ts, seq) via
    // unique-(tus, seq) row_number.
    "stream_bars" -> streamBarsOracleSql,

    // Kill-and-resume recovery: the resumed two-run result must equal the
    // uninterrupted run, so the oracle IS stream_bars' (shared verbatim).
    "stream_resume" -> streamBarsOracleSql,

    // One-batch transformWithState replay: each key emits once with its
    // converged totals — exactly the batch aggregate.
    "stream_twstate" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(event_id % 100) AS BIGINT) AS checksum
         FROM events GROUP BY user_id""",

    // Hopping replay: each event explodes to its 2 slide-aligned window
    // starts; same strict window-end ≤ watermark emission cutoff.
    "stream_hopping" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS tus, event_type,
                           event_id % 100 AS v
                    FROM events),
         w AS (SELECT ((tus // 300000000) - j) * 300000000 AS win_start_us,
                      event_type, v
               FROM e, unnest([0, 1]) AS t(j)),
         g AS (SELECT win_start_us, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n_events,
                      CAST(SUM(v) AS BIGINT) AS checksum
               FROM w GROUP BY win_start_us, event_type),
         wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us
                FROM events)
         SELECT win_start_us, event_type, n_events, checksum
         FROM g, wm WHERE win_start_us + 600000000 <= wm_us""",

    "stream_minute_bars" ->
      """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                  epoch_ns(ts) // 1000 AS tus,
                  CAST((event_id * 37) % 10000 AS DOUBLE) AS px,
                  CAST(event_id % 100 + 1 AS DOUBLE) AS qty,
                  event_id AS seq
           FROM events),
         b AS (SELECT *, (tus // 300000000) * 300000000 AS bar_start_us FROM t),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus, seq) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus DESC, seq DESC) AS rd
               FROM b),
         g AS (SELECT symbol, bar_start_us,
                 MAX(CASE WHEN ra = 1 THEN px END) AS open,
                 MAX(px) AS high, MIN(px) AS low,
                 MAX(CASE WHEN rd = 1 THEN px END) AS close,
                 SUM(qty) AS volume, SUM(px * qty) AS money,
                 CAST(COUNT(*) AS BIGINT) AS n_ticks
               FROM r GROUP BY symbol, bar_start_us),
         wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us FROM events)
         SELECT symbol, bar_start_us, open, high, low, close, volume, money, n_ticks
         FROM g, wm WHERE bar_start_us + 300000000 <= wm_us""",

    // Streaming sessionizer: the batch gap-sessionization (same strict->
    // gap, ms precision) with the one-batch emission rule — every session
    // except each user's last, plus the last iff its event-time timeout
    // (end + gap) fell strictly behind the final watermark. session_value
    // replays the operator's sequential (ms, value)-ordered fold.
    "stream_sessions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS tms, value FROM events),
         m AS (SELECT *, CASE WHEN tms - LAG(tms) OVER w > 1800000
                        OR LAG(tms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tms, value)),
         s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
               FROM m),
         g AS (SELECT user_id, sid, MIN(tms) AS start_ms, MAX(tms) AS end_ms,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 list_reduce([CAST(0 AS DOUBLE)] || list(value ORDER BY tms, value),
                   (p, q) -> p + q) AS session_value
               FROM s GROUP BY user_id, sid),
         wm AS (SELECT MAX(epoch_ns(ts) // 1000000) - 601000 AS wm_ms FROM events),
         lastg AS (SELECT user_id, MAX(end_ms) AS last_end FROM g GROUP BY user_id)
         SELECT g.user_id, g.start_ms, g.end_ms, g.n_events, g.session_value
         FROM g JOIN lastg USING (user_id), wm
         WHERE g.end_ms < lastg.last_end OR g.end_ms + 1800000 < wm.wm_ms""",

    // Native merging session windows: µs-exact island detection (strict
    // under-gap merge), end = last event + gap, emission once the final
    // watermark passes the session end.
    "stream_session_window" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS tus, value FROM events),
         m AS (SELECT *, CASE WHEN tus - LAG(tus) OVER w >= 1800000000
                        OR LAG(tus) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, value)),
         s AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
               FROM m),
         g AS (SELECT user_id, sid, MIN(tus) AS start_us,
                 MAX(tus) + 1800000000 AS end_us,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6))
                   AS DOUBLE) AS session_value
               FROM s GROUP BY user_id, sid),
         wm AS (SELECT MAX(epoch_ns(ts) // 1000) - 601000000 AS wm_us FROM events)
         SELECT g.user_id, g.start_us, g.end_us, g.n_events, g.session_value
         FROM g, wm
         WHERE g.end_us < wm.wm_us""",

    // Closed-form grid replay: the connector's (symbol × day) grid is
    // range() × range(); the symbol naming and the day-index arithmetic
    // are the whole contract (SUM cast back to BIGINT — DuckDB's
    // SUM(BIGINT)→HUGEINT widening is the graph_pagerank hash trap).
    "stream_dsv2" ->
      """WITH g AS (SELECT CAST(s.range AS INT) AS i FROM range(0, 20) s),
              d AS (SELECT CAST(r.range AS INT) AS dd FROM range(0, 200) r)
         SELECT lpad(CAST(i AS VARCHAR), 6, '0') ||
                  CASE WHEN i % 2 = 0 THEN '.SZ' ELSE '.SS' END AS symbol,
                CAST(COUNT(*) AS BIGINT) AS n_days,
                MIN(DATE '2020-01-01' + dd) AS first_date,
                MAX(DATE '2020-01-01' + dd) AS last_date,
                CAST(SUM(CAST(dd AS BIGINT)) AS BIGINT) AS day_sum
         FROM g, d GROUP BY 1""",

    // Sink round trip is value-preserving: stateless filter+projection,
    // so the table contents equal the batch predicate (exactly once —
    // every epoch's rows appear exactly one time).
    "stream_dsv2_sink" ->
      """SELECT user_id, event_id, event_type, value
         FROM events WHERE event_type <> 'view'""",

    // Stateless PIT join replays as the identical batch interval join
    // over the epoch table in SCD2 form.
    "stream_pit_enrich" ->
      s"""$MKT, $industryHistoryCtes,
          iv AS (SELECT symbol, effective_date,
                   lead(effective_date) OVER (PARTITION BY symbol
                                              ORDER BY effective_date) AS next_eff,
                   industry
                 FROM indhist)
          SELECT b.symbol, b.date, b.close, iv.industry
          FROM bars b JOIN iv ON b.symbol = iv.symbol
            AND b.date >= iv.effective_date
            AND (iv.next_eff IS NULL OR b.date < iv.next_eff)""",

    // Complete-mode convergence: the final table IS the batch aggregate.
    "stream_running_totals" ->
      """SELECT event_type, count(*) AS n_events,
                CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type""",

    // The bound framing: the oracle asserts the EXPECTATION (within=TRUE
    // for every emitted window × p); window membership and counts are
    // exact, and only a genuine sketch-bound violation diverges.
    "stream_quantiles" ->
      """WITH t AS (SELECT (epoch_ns(ts) // 1000 // 3600000000) * 3600000000 AS win_start_us
                    FROM events),
          g AS (SELECT win_start_us, CAST(COUNT(*) AS BIGINT) AS n
                FROM t GROUP BY win_start_us),
          wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us FROM events)
          SELECT win_start_us, p_label, n, TRUE AS within
          FROM g CROSS JOIN (VALUES ('p50'), ('p90')) pl(p_label), wm
          WHERE win_start_us + 3600000000 <= wm_us""",

    // Mirrors stream_drift: hour windows off epoch µs, the same fixed-bin
    // counts, BIGINT score vs the shared DriftRef literals, stream_bars'
    // emission cutoff.
    "stream_drift" -> {
      val bins = (0 to 9).map(b =>
        s"CAST(SUM(CASE WHEN bin = $b THEN 1 ELSE 0 END) AS BIGINT) AS b$b").mkString(", ")
      val score = (0 to 9).map(b =>
        s"(b$b * 1000 - ${DriftRef(b)} * n) * (b$b * 1000 - ${DriftRef(b)} * n)").mkString(" + ")
      s"""WITH t AS (SELECT epoch_ns(ts) // 1000 AS tus,
                   CAST(least(greatest(floor(value / 50.0), 0), 9) AS INT) AS bin
                 FROM events),
          w AS (SELECT (tus // 3600000000) * 3600000000 AS win_start_us, bin FROM t),
          g AS (SELECT win_start_us, CAST(COUNT(*) AS BIGINT) AS n, $bins
                FROM w GROUP BY win_start_us),
          s AS (SELECT win_start_us, n, CAST($score AS BIGINT) AS score FROM g),
          wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us FROM events)
          SELECT win_start_us, n, score, score > 5000 * n * n AS drift
          FROM s, wm WHERE win_start_us + 3600000000 <= wm_us"""
    },

    // Mirrors StreamAnomaly.zscores(n=8, k=2) under one-batch replay:
    // every event alerts, so this is w6_zscore's tree on the events table
    // keyed by user ordered by (event time, event_id).
    // Streaming CUSUM: the batch fold replayed in the STREAM's in-batch
    // order — (event-time ms, event_id), NOT ts_ns (the operator sorts by
    // Timestamp.getTime, ms grain; event_id breaks the ms ties).
    "stream_cusum" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
                           CAST((event_id % 100) - 45 AS DOUBLE) AS x
                    FROM events),
          g AS (SELECT user_id,
                  list(event_id ORDER BY tms, event_id) AS ids,
                  list(x ORDER BY tms, event_id) AS vs
                FROM e GROUP BY user_id),
          r AS (SELECT user_id, ids, vs,
                  list_reduce(
                    [CAST([] AS DOUBLE[])] || list_transform(vs, v -> [v]),
                    (acc, el) -> acc || [GREATEST(0.0,
                      CASE WHEN len(acc) = 0 THEN el[1]
                           ELSE acc[-1] + el[1] END)]) AS run
                FROM g)
          SELECT user_id, UNNEST(ids) AS event_id, UNNEST(run) AS cusum,
                 UNNEST(list_transform(run, s -> s > 400.0)) AS alarm
          FROM r""",

    "stream_anomaly" ->
      """WITH r AS (
           SELECT user_id, event_id, CAST(value AS DOUBLE) AS xv,
                  list(CAST(value AS DOUBLE)) OVER w AS lx
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
         s AS (SELECT user_id, event_id, xv,
                  CAST(len(lx) AS DOUBLE) AS nn,
                  list_reduce([CAST(0 AS DOUBLE)] || lx, (a,b) -> a + b) AS sx,
                  list_reduce([CAST(0 AS DOUBLE)] || list_transform(lx, v -> v * v), (a,b) -> a + b) AS sxx
               FROM r)
         SELECT user_id, event_id, CAST(nn AS BIGINT) AS n_frame,
                CASE WHEN nn * sxx - sx * sx > 0
                     THEN (xv * nn - sx) / sqrt(nn * sxx - sx * sx) END AS z,
                (nn * sxx - sx * sx > 0 AND
                 (xv * nn - sx) * (xv * nn - sx) > 4.0 * (nn * sxx - sx * sx)) AS outlier
         FROM s""",

    // Stream-static join is stateless: one batch ≡ the batch left join;
    // withheld dim members take the UNKNOWN default.
    "stream_enrich_dim" ->
      """SELECT e.event_id, e.user_id, e.value,
                COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
         FROM events e
           LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
                      WHERE c_custkey % 3 <> 0) c
             ON e.user_id = c.c_custkey""",

    "stream_dedup" ->
      """SELECT DISTINCT md5(text) AS content_hash,
                CAST(length(text) AS BIGINT) AS content_len
         FROM documents""",

    // The built-in dedup operator produces the identical final set.
    "stream_dedup_wm" ->
      """SELECT DISTINCT md5(text) AS content_hash,
                CAST(length(text) AS BIGINT) AS content_len
         FROM documents""",

    // Final per-key CDC state: n_since/sum_since replay as the ordered
    // fold over upserts AFTER the last tombstone (a delete row is never
    // Relative-rank replay: identical definitions and identical integer
    // operands into the one IEEE division each.
    "w19_rank_ratios" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
                CAST(l_quantity AS BIGINT) AS qty,
                percent_rank() OVER (PARTITION BY l_suppkey
                                     ORDER BY CAST(l_quantity AS BIGINT)) AS pr,
                cume_dist() OVER (PARTITION BY l_suppkey
                                  ORDER BY CAST(l_quantity AS BIGINT)) AS cd
         FROM lineitem WHERE l_suppkey % 20 = 2""",

    // Token-bucket replay: the stride-2 running-list fold (rule 9: one
    // reduce, per-key lists) — acc appends [packed, ts] per event where
    // packed = tokens_after*2 + allowed; prev level = floor(acc[-2]/2),
    // prev ts = acc[-1]; refill = least(cap, prev + (t - prev_ts) * r).
    // All values integral and < 2^31, exact in the DOUBLE lists.
    "w18_token_bucket" ->
      s"""${tokenBucketFoldCtes(capMt = 2000L, costMt = 1000L)}
          SELECT user_id,
                 CAST(e2[1] AS BIGINT) AS sec,
                 CAST(e2[2] AS BIGINT) AS event_id,
                 CAST(pk AS BIGINT) % 2 = 1 AS allowed,
                 CAST(floor(pk / 2) AS BIGINT) AS tokens_mt
          FROM (SELECT user_id,
                  UNNEST(els) AS e2,
                  UNNEST(list_transform(range(0, len(els)),
                    k -> run[CAST(2 * k + 1 AS INT)])) AS pk
                FROM f)""",

    // Streaming twin: same fold, verdict-only projection (the stream op
    // emits no clock column — event_id is the unique join key).
    "stream_rate_limit" ->
      s"""${tokenBucketFoldCtes(capMt = 2000L, costMt = 1000L)}
          SELECT user_id,
                 CAST(e2[2] AS BIGINT) AS event_id,
                 CAST(pk AS BIGINT) % 2 = 1 AS allowed,
                 CAST(floor(pk / 2) AS BIGINT) AS tokens_mt
          FROM (SELECT user_id,
                  UNNEST(els) AS e2,
                  UNNEST(list_transform(range(0, len(els)),
                    k -> run[CAST(2 * k + 1 AS INT)])) AS pk
                FROM f)""",

    // Inter-arrival replay: exact BIGINT ts_ns diffs; nearest-rank median
    // (rank-k VALUE is tie-invariant because the rank order sorts by the
    // value first).
    "events_inter_arrival" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id FROM events),
          g AS (SELECT user_id, event_id,
                  tsn - LAG(tsn) OVER (PARTITION BY user_id
                                       ORDER BY tsn, event_id) AS gap_ns
                FROM e),
          f AS (SELECT user_id, event_id, gap_ns,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY gap_ns, event_id) AS rn,
                  COUNT(*) OVER (PARTITION BY user_id) AS n
                FROM g WHERE gap_ns IS NOT NULL)
          SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_gaps,
                 MIN(gap_ns) AS min_gap_ns, MAX(gap_ns) AS max_gap_ns,
                 MAX(CASE WHEN rn = CEIL(n * 0.5) THEN gap_ns END) AS p50_gap_ns
          FROM f GROUP BY user_id""",

    // after the max delete ts, so the strict > filter is exact).
    "stream_cdc" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
                           event_type = 'error' AS is_del,
                           COALESCE(value, 0) AS value
                    FROM events),
          d AS (SELECT user_id, MAX(tsn) AS del_ts FROM e
                WHERE is_del GROUP BY user_id),
          j AS (SELECT e.user_id, e.tsn, e.event_id, e.value,
                       (d.del_ts IS NULL OR e.tsn > d.del_ts) AS after_del
                FROM e LEFT JOIN d USING (user_id)),
          agg AS (SELECT user_id,
                    CAST(COUNT(*) AS BIGINT) AS n_ops,
                    MAX(tsn) AS last_ts_ns,
                    CAST(COUNT(*) FILTER (WHERE after_del) AS BIGINT) AS n_since,
                    COALESCE(list(value ORDER BY tsn, event_id)
                               FILTER (WHERE after_del),
                             CAST([] AS DOUBLE[])) AS vs
                  FROM j GROUP BY user_id)
          SELECT user_id, n_ops, n_since,
                 list_reduce([CAST(0 AS DOUBLE)] || vs, (a, b) -> a + b)
                   AS sum_since,
                 last_ts_ns, n_since > 0 AS live
          FROM agg""",

    // Window bucketing + the stream_bars emission cutoff, then the same
    // (cnt DESC, event_type) rank — deterministic under count ties.
    "stream_topk" ->
      """WITH t AS (SELECT epoch_ns(ts) // 1000 AS tus, event_type FROM events),
          b AS (SELECT (tus // 3600000000) * 3600000000 AS win_us, event_type
                FROM t),
          g AS (SELECT win_us, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM b GROUP BY win_us, event_type),
          wm AS (SELECT (MAX(epoch_ns(ts) // 1000000) - 601000) * 1000 AS wm_us
                 FROM events),
          em AS (SELECT g.* FROM g, wm WHERE win_us + 3600000000 <= wm_us),
          r AS (SELECT win_us, event_type, cnt,
                       CAST(ROW_NUMBER() OVER (PARTITION BY win_us
                         ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
                FROM em)
          SELECT win_us, event_type, cnt, rnk FROM r WHERE rnk <= 3""",

    "events_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id
                    FROM events),
         p AS (SELECT event_type AS from_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                        ORDER BY tsn, event_id) AS to_type
               FROM e)
         SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
         FROM p WHERE to_type IS NOT NULL
         GROUP BY from_type, to_type""",

    // Gaps-and-islands replay: lag → change flag → prefix-sum island id →
    // per-island bounds, then lead for the half-open upper bound.
    "j14_scd2" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_type
                    FROM events),
          l AS (SELECT user_id, ts_ns, event_type,
                       CASE WHEN lag(event_type) OVER w IS NULL
                                 OR lag(event_type) OVER w <> event_type
                            THEN 1 ELSE 0 END AS chg
                FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns)),
          i AS (SELECT user_id, ts_ns, event_type,
                       SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ns
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                FROM l),
          g AS (SELECT user_id, island, MIN(event_type) AS event_type,
                       MIN(ts_ns) AS valid_from,
                       CAST(COUNT(*) AS BIGINT) AS n_rows
                FROM i GROUP BY user_id, island)
          SELECT user_id, event_type, valid_from,
                 lead(valid_from) OVER w2 AS valid_to, n_rows,
                 lead(valid_from) OVER w2 IS NULL AS is_current
          FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from)""",

    // The tier dimension replays as islands over purchases; the lookup as
    // an explicit half-open interval join (NOT DuckDB ASOF — its
    // null-probe semantics differ from the house contract).
    "j15_scd2_lookup" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
                           event_type, value
                    FROM events),
          p AS (SELECT user_id, ts_ns,
                       CAST(floor(value / 25e0) AS BIGINT) AS tier
                FROM e WHERE event_type = 'purchase'),
          l AS (SELECT user_id, ts_ns, tier,
                       CASE WHEN lag(tier) OVER w IS NULL
                                 OR lag(tier) OVER w <> tier
                            THEN 1 ELSE 0 END AS chg
                FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns)),
          i AS (SELECT user_id, ts_ns, tier,
                       SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ns
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
                FROM l),
          g AS (SELECT user_id, island, MIN(tier) AS tier,
                       MIN(ts_ns) AS valid_from
                FROM i GROUP BY user_id, island),
          iv AS (SELECT user_id, tier, valid_from,
                        lead(valid_from) OVER (PARTITION BY user_id
                          ORDER BY valid_from) AS valid_to
                 FROM g)
          SELECT e.user_id, e.ts_ns, e.event_id, iv.tier
          FROM e LEFT JOIN iv
            ON e.user_id = iv.user_id AND iv.valid_from <= e.ts_ns
               AND (iv.valid_to IS NULL OR e.ts_ns < iv.valid_to)""",

    // Stateless stream-static join: one-batch replay ≡ the batch join.
    "stream_enrich" ->
      """WITH prof AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                  CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6))
                    AS DOUBLE) AS total_value
              FROM events GROUP BY user_id)
         SELECT e.event_id, e.user_id, e.value, p.n_events, p.total_value,
                p.n_events >= 67 AS is_heavy
         FROM events e LEFT JOIN prof p USING (user_id)""",

    // Incremental refresh ≡ full recompute: the oracle IS the full-data
    // bar build — no emission filter, no cutoff. Any stale boundary bar
    // the upsert failed to replace diverges here.
    "stream_incr_refresh" ->
      """WITH t AS (SELECT 'S' || CAST(user_id % 20 AS VARCHAR) AS symbol,
                  epoch_ns(ts) // 1000 AS tus,
                  CAST((event_id * 37) % 10000 AS DOUBLE) AS px,
                  CAST(event_id % 100 + 1 AS DOUBLE) AS qty,
                  event_id AS seq
           FROM events),
         b AS (SELECT *, (tus // 3600000000) * 3600000000 AS bar_start_us FROM t),
         r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus, seq) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY symbol, bar_start_us ORDER BY tus DESC, seq DESC) AS rd
               FROM b)
         SELECT symbol, bar_start_us,
                MAX(CASE WHEN ra = 1 THEN px END) AS open,
                MAX(px) AS high, MIN(px) AS low,
                MAX(CASE WHEN rd = 1 THEN px END) AS close,
                SUM(qty) AS volume, SUM(px * qty) AS money,
                CAST(COUNT(*) AS BIGINT) AS n_ticks
         FROM r GROUP BY symbol, bar_start_us""",

    // Mirrors Sampling.tokenBudgetMixture(en 4000, de 2000, es 10000000,
    // zh 1000): integer-division thresholds from in-plan token totals, the
    // md5-prefix bucket membership of sample_stratified.
    "sample_mixture" ->
      """WITH d AS (SELECT doc_id, lang,
                 CAST(len(list_filter(string_split(text,' '), x -> length(x)>0)) AS BIGINT) AS n_tokens
               FROM documents),
         t AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS stratum_tokens
               FROM d GROUP BY lang),
         th AS (SELECT lang, stratum_tokens,
                  least(CAST(1000000 AS BIGINT),
                        CAST(CASE lang WHEN 'en' THEN 4000 WHEN 'de' THEN 2000
                                       WHEN 'es' THEN 10000000 WHEN 'zh' THEN 1000
                                       ELSE 0 END AS BIGINT) * 1000000 // stratum_tokens) AS threshold
                FROM t WHERE stratum_tokens > 0)
         SELECT d.doc_id, d.lang, d.n_tokens, th.stratum_tokens, th.threshold
         FROM d JOIN th USING (lang)
         WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < th.threshold""",

    // Mirrors Relevance.ngramTopK(n = 2, k = 20): every bigram occurrence
    // counted (no distinct), total order (cnt DESC, ngram ASC).
    "text_ngram_topk" ->
      """WITH w AS (SELECT list_filter(string_split(text,' '), x -> length(x)>0) AS ws FROM documents),
         g AS (SELECT ws[i] || ' ' || ws[i+1] AS ngram
               FROM w, unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
         c AS (SELECT ngram, COUNT(*) AS cnt FROM g GROUP BY ngram)
         SELECT ngram, cnt, rank FROM (
           SELECT ngram, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, ngram ASC) AS BIGINT) AS rank
           FROM c)
         WHERE rank <= 20""",

    // TV-distance replay: same cross-multiplied integer numerator, same
    // single division; window sums BIGINT-cast (HUGEINT widening).
    "text_tv_distance" ->
      """WITH w AS (SELECT source,
               list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
             FROM documents WHERE source IN ('src0', 'src1')),
          c AS (SELECT source, x AS word, CAST(COUNT(*) AS BIGINT) AS c
                FROM w, unnest(ws) AS t(x) GROUP BY source, x),
          j AS (SELECT COALESCE(a.c, 0) AS c1, COALESCE(b.c, 0) AS c2
                FROM (SELECT word, c FROM c WHERE source = 'src0') a
                FULL OUTER JOIN (SELECT word, c FROM c WHERE source = 'src1') b
                  USING (word)),
          s AS (SELECT c1, c2,
                       CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                       CAST(SUM(c2) OVER () AS BIGINT) AS n2
                FROM j)
          SELECT MAX(n1) AS n1, MAX(n2) AS n2,
                 CAST(SUM(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS tv_num,
                 CAST(CAST(SUM(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS DOUBLE)
                   / (2.0 * CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)) AS tv
          FROM s""",

    // PMI replay: identical integer products, one IEEE division, same
    // (ratio DESC, bigram ASC) total order.
    "text_collocations" ->
      """WITH w AS (SELECT list_filter(string_split(text,' '), x -> length(x)>0) AS ws FROM documents),
         u AS (SELECT x AS w1, CAST(COUNT(*) AS BIGINT) AS c1
               FROM w, unnest(ws) AS t(x) GROUP BY x),
         tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_uni FROM u),
         g AS (SELECT ws[i] AS wa, ws[i+1] AS wb
               FROM w, unnest(range(1, len(ws))) AS t(i) WHERE len(ws) >= 2),
         totb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM g),
         b AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS n_pair
               FROM g GROUP BY wa, wb HAVING COUNT(*) >= 5),
         s AS (SELECT wa || ' ' || wb AS bigram, n_pair,
                      CAST(CAST(n_pair AS HUGEINT) * n_uni * n_uni AS DECIMAL(38,0)) AS num,
                      CAST(CAST(n_bi AS HUGEINT) * ca.c1 * cb.c1 AS DECIMAL(38,0)) AS den
               FROM b JOIN u ca ON b.wa = ca.w1 JOIN u cb ON b.wb = cb.w1
               CROSS JOIN tot CROSS JOIN totb)
         SELECT bigram, n_pair,
                CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS pmi_ratio, rank
         FROM (SELECT *, CAST(ROW_NUMBER() OVER (
                 ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
                          bigram ASC) AS BIGINT) AS rank
               FROM s)
         WHERE rank <= 20""",

    // Mirrors Sampling.stratified(en→0.5, de→0.25, default 0.1) on key
    // doc_id: same 60-bit md5-prefix bucket as the Md5Hash lane family.
    "sample_split" ->
      """SELECT doc_id,
           CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < 800000 THEN 'train'
                WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < 900000 THEN 'val'
                ELSE 'test' END AS split
         FROM documents""",

    // Leakage-safe replay: the shared minhash pair CTEs, connected
    // components as a bounded recursive min-label CTE over the pair graph
    // (the graph-family discipline), then the same md5 bucket on the
    // COMPONENT label (singletons: the doc's own id).
    "sample_leakage_split" ->
      s"""${minHashPairCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
          ud AS (SELECT doc_a AS x, doc_b AS y FROM vp
                 UNION SELECT doc_b, doc_a FROM vp),
          r(node, lbl) AS (
            SELECT DISTINCT x, x FROM ud
            UNION
            SELECT ud.y, r.lbl FROM r JOIN ud ON r.node = ud.x),
          cc AS (SELECT node, MIN(lbl) AS component FROM r GROUP BY node),
          asn AS (SELECT d.doc_id,
                    COALESCE(cc.component, d.doc_id) AS component
                  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id)
          SELECT doc_id, component,
            CASE WHEN CAST('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < 800000 THEN 'train'
                 WHEN CAST('0x' || substring(md5(CAST(component AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 < 900000 THEN 'val'
                 ELSE 'test' END AS split
          FROM asn""",

    // Same md5-bucket ordering as the sampler family; ties break on the
    // key, so the kept set replays exactly.
    "sample_source_cap" ->
      """SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000,
                             doc_id) AS rk
           FROM documents) WHERE rk <= 10""",

    // Mirrors Sampling.balancePerGroup: same md5 rank, cap = min group size.
    "sample_balanced" ->
      """WITH mn AS (SELECT MIN(c) AS m FROM (
                       SELECT COUNT(*) AS c FROM documents GROUP BY source))
         SELECT doc_id, source FROM (
           SELECT doc_id, source,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000,
                             doc_id) AS rk
           FROM documents), mn WHERE rk <= m""",

    // Mirrors Sampling.weighted(wMax=400, rate=0.5): bucket·wMax <
    // clamp(n_chars)·500000, all integers.
    // Triplet replay: same lead window, same affine negative map with the
    // self-remap, same hard-negative flag.
    "sample_triplets" ->
      """WITH d AS (SELECT doc_id, source FROM documents),
          n AS (SELECT MAX(doc_id) + 1 AS nd FROM d),
          p AS (SELECT doc_id, source,
                       lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS pos_id
                FROM d),
          t AS (SELECT doc_id, source, pos_id,
                       CASE WHEN (doc_id * 7919 + 13) % nd = doc_id
                            THEN ((doc_id * 7919 + 13) % nd + 1) % nd
                            ELSE (doc_id * 7919 + 13) % nd END AS neg_id
                FROM p, n WHERE pos_id IS NOT NULL)
          SELECT t.doc_id AS anchor_id, t.pos_id, t.neg_id,
                 t.source = d2.source AS is_hard
          FROM t JOIN d d2 ON t.neg_id = d2.doc_id""",

    "sample_weighted" ->
      """SELECT doc_id, n_chars FROM documents
         WHERE (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000) * 400
             < LEAST(GREATEST(n_chars, 0), 400) * 500000""",

    "sample_stratified" ->
      """WITH b AS (SELECT doc_id, lang,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS bucket
             FROM documents)
         SELECT doc_id, lang, bucket FROM b
         WHERE bucket < CASE lang WHEN 'en' THEN 500000
                                  WHEN 'de' THEN 250000
                                  ELSE 100000 END""",

    // Mirrors Quantiles.exactDisc: nearest-rank (percentile_disc) — the
    // value AT rank ceil(p·n), selected not interpolated, so exact.
    "quantiles_disc" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem)
         SELECT l_returnflag, MAX(n) AS n,
                MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.5) AS BIGINT) THEN v END) AS p50,
                MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.9) AS BIGINT) THEN v END) AS p90,
                MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.99) AS BIGINT) THEN v END) AS p99
         FROM r GROUP BY l_returnflag""",

    // Mirrors Quantiles.winsorize(0.05, 0.95) + the gate's summary: the
    // nearest-rank cutoff picks, then clip counts and the decimal-routed
    // sum of least(greatest(v, lo), hi).
    "quantiles_winsorize" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem),
          cuts AS (SELECT l_returnflag,
               MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.05) AS BIGINT) THEN v END) AS cut_lo,
               MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.95) AS BIGINT) THEN v END) AS cut_hi
             FROM r GROUP BY l_returnflag)
          SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 MAX(c.cut_lo) AS cut_lo, MAX(c.cut_hi) AS cut_hi,
                 CAST(SUM(CASE WHEN l.l_extendedprice < c.cut_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                 CAST(SUM(CASE WHEN l.l_extendedprice > c.cut_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
                 CAST(CAST(SUM(CAST(least(greatest(l.l_extendedprice, c.cut_lo), c.cut_hi)
                                    AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_clipped
          FROM lineitem l JOIN cuts c USING (l_returnflag)
          GROUP BY l.l_returnflag""",

    // IQR fences: nearest-rank quartiles on the DOUBLE-cast value, the
    // identical three-op fence tree, exact outlier counts.
    "quantiles_iqr_outliers" ->
      """WITH r AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem),
          cuts AS (SELECT l_returnflag,
               MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.25) AS BIGINT) THEN v END) AS q1,
               MAX(CASE WHEN rn = CAST(ceil(CAST(n AS DOUBLE) * 0.75) AS BIGINT) THEN v END) AS q3
             FROM r GROUP BY l_returnflag),
          f AS (SELECT l_returnflag, q1, q3,
                       q1 - 1.5 * (q3 - q1) AS lo_fence,
                       q3 + 1.5 * (q3 - q1) AS hi_fence
                FROM cuts)
          SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 MAX(f.q1) AS q1, MAX(f.q3) AS q3,
                 MAX(f.lo_fence) AS lo_fence, MAX(f.hi_fence) AS hi_fence,
                 CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
                 CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DOUBLE) > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_high
          FROM lineitem l JOIN f USING (l_returnflag)
          GROUP BY l.l_returnflag""",

    // Mirrors Quantiles.exactCont's expression tree exactly: h=(n-1)p,
    // lower/upper rank picks, then lo + (hi-lo)*frac in IEEE doubles.
    "quantiles_cont" ->
      """WITH r AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem),
         a AS (SELECT l_returnflag, MAX(n) AS n,
                MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN v END) AS lo0,
                MAX(CASE WHEN rn = LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 2, n) THEN v END) AS hi0,
                MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN v END) AS lo1,
                MAX(CASE WHEN rn = LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 2, n) THEN v END) AS hi1,
                MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 THEN v END) AS lo2,
                MAX(CASE WHEN rn = LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 2, n) THEN v END) AS hi2
               FROM r GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                lo0 + (hi0 - lo0) * (CAST(n - 1 AS DOUBLE) * 0.5 - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS p50,
                lo1 + (hi1 - lo1) * (CAST(n - 1 AS DOUBLE) * 0.9 - floor(CAST(n - 1 AS DOUBLE) * 0.9)) AS p90,
                lo2 + (hi2 - lo2) * (CAST(n - 1 AS DOUBLE) * 0.99 - floor(CAST(n - 1 AS DOUBLE) * 0.99)) AS p99
         FROM a""",

    // Mirrors Quantiles.madExact: the quantiles_cont p50 tree, deviations
    // |v − med| as single subtractions, the same tree again over them.
    "quantiles_mad" ->
      """WITH r AS (SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS v,
               CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_extendedprice AS DOUBLE)) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem),
         a AS (SELECT l_returnflag, MAX(n) AS n,
                MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN v END) AS lo0,
                MAX(CASE WHEN rn = LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 2, n) THEN v END) AS hi0
               FROM r GROUP BY l_returnflag),
         m AS (SELECT l_returnflag, n,
                lo0 + (hi0 - lo0) * (CAST(n - 1 AS DOUBLE) * 0.5 - floor(CAST(n - 1 AS DOUBLE) * 0.5)) AS med
               FROM a),
         d AS (SELECT r.l_returnflag, abs(r.v - m.med) AS dv
               FROM r JOIN m ON r.l_returnflag = m.l_returnflag),
         dr AS (SELECT l_returnflag, dv,
                 CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY dv) AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
                FROM d),
         da AS (SELECT l_returnflag, MAX(n) AS n,
                 MAX(CASE WHEN rn = CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN dv END) AS lo0,
                 MAX(CASE WHEN rn = LEAST(CAST(floor(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 2, n) THEN dv END) AS hi0
                FROM dr GROUP BY l_returnflag)
         SELECT da.l_returnflag, da.n,
                m.med,
                da.lo0 + (da.hi0 - da.lo0) * (CAST(da.n - 1 AS DOUBLE) * 0.5 - floor(CAST(da.n - 1 AS DOUBLE) * 0.5)) AS mad
         FROM da JOIN m ON da.l_returnflag = m.l_returnflag""",

    // The oracle encodes the EXPECTATION that the sketch meets its rank-
    // error bound: TRUE per (group, p). Everything else in the row (group,
    // label, n) is exact, so the compare is hash-stable; only a genuine
    // bound violation on the Spark side can diverge.
    "quantiles_approx" ->
      """SELECT l_returnflag, p_label, CAST(COUNT(l_extendedprice) AS BIGINT) AS n,
                TRUE AS within
         FROM lineitem CROSS JOIN (VALUES ('p50'), ('p90'), ('p99')) t(p_label)
         GROUP BY 1, 2""",

    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
         FROM documents GROUP BY md5(text)""",

    // URL canonicalization replay: same synthesis CASE, same capture
    // groups, same normalization steps (RE2-safe pattern on both sides).
    "dedup_url" ->
      """WITH u AS (SELECT doc_id,
            CASE WHEN doc_id % 4 = 0 THEN 'HTTP://Example.COM:80/p/' || CAST(doc_id // 4 AS VARCHAR) || '/#frag'
                 WHEN doc_id % 4 = 1 THEN 'https://Example.com:443/p/' || CAST(doc_id // 4 AS VARCHAR) || '?b=2&utm_source=x&a=1'
                 WHEN doc_id % 4 = 2 THEN 'http://example.com/p/' || CAST(doc_id // 4 AS VARCHAR)
                 ELSE 'https://sub.example.com/q/?x=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_campaign=z#top' END AS url
          FROM documents),
         p AS (SELECT doc_id,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 1)) AS scheme,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 2)) AS host,
            regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 3) AS port,
            regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 4), '/+$', '') AS path,
            regexp_replace(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$', 5), '^\?', '') AS rawq
          FROM u),
         c AS (SELECT doc_id,
            scheme || '://' || host ||
            CASE WHEN (scheme = 'http' AND port = ':80')
                   OR (scheme = 'https' AND port = ':443')
                 THEN '' ELSE port END ||
            path ||
            CASE WHEN len(list_filter(string_split(rawq, '&'),
                     x -> length(x) > 0 AND substring(x, 1, 4) <> 'utm_')) > 0
                 THEN '?' || array_to_string(list_sort(list_filter(
                        string_split(rawq, '&'),
                        x -> length(x) > 0 AND substring(x, 1, 4) <> 'utm_')), '&')
                 ELSE '' END AS canonical_url
          FROM p)
         SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_dups,
                MIN(doc_id) AS keep_id
         FROM c GROUP BY canonical_url""",

    "text_extract_all" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n_hits
         FROM (SELECT unnest(regexp_extract_all(text, '[a-z]{7,}')) AS token
               FROM documents)
         GROUP BY token""",

    "p7_json_extract" ->
      """WITH e AS (SELECT event_type,
                          CAST(props ->> 'k' AS INTEGER) AS k
                   FROM events)
         SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(COUNT(k) AS BIGINT) AS n_with_k,
                CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
         FROM e GROUP BY event_type""",

    "p5_crosstab" ->
      """SELECT source,
                CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
                CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
                CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
                CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
                CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh
         FROM documents GROUP BY source""",

    "p6_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,6)))
                    AS DECIMAL(25,6)) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_linestatus), ())""",

    // Mirrors Decontam.stripBenchSpans(n=5, bench = doc_id%50==0): the
    // strip-spans replay with the bench set as the dirty-span source.
    "decontam_strip" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         bg AS (SELECT DISTINCT span FROM (
                  SELECT unnest(list_distinct(list_transform(range(0, len(ws)-4),
                           i -> array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+5], ' ')))) AS span
                  FROM w WHERE doc_id % 50 = 0 AND len(ws) >= 5)),
         ps AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                  array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+5], ' ') AS span
                FROM w, unnest(range(0, len(ws)-4)) AS t(i) WHERE len(ws) >= 5),
         st AS (SELECT ps.doc_id, list(ps.pos ORDER BY ps.pos) AS starts
                FROM ps JOIN bg USING (span) GROUP BY ps.doc_id),
         j AS (SELECT w.doc_id, w.ws,
                      COALESCE(st.starts, CAST([] AS BIGINT[])) AS starts
               FROM w LEFT JOIN st ON w.doc_id = st.doc_id),
         k AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                 list_filter(ws, (tk, i) ->
                   len(list_filter(starts, s -> i-1 >= s AND i-1 <= s+4)) = 0) AS kept
               FROM j)
         SELECT doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
                md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_hash
         FROM k""",

    // Mirrors Dedup.stripDupSpans(w=8, minDocs=2): dup start positions
    // per doc, indexed token filter (DuckDB lambda i is 1-BASED — i−1
    // aligns with Spark's 0-based index), md5 of the rebuilt text.
    "dedup_strip_spans" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         ps AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
                  array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+8], ' ') AS span
                FROM w, unnest(range(0, len(ws)-7)) AS t(i) WHERE len(ws) >= 8),
         ds AS (SELECT span FROM (SELECT DISTINCT doc_id, span FROM ps)
                GROUP BY span HAVING count(*) >= 2),
         st AS (SELECT ps.doc_id, list(ps.pos ORDER BY ps.pos) AS starts
                FROM ps JOIN ds USING (span) GROUP BY ps.doc_id),
         j AS (SELECT w.doc_id, w.ws,
                      COALESCE(st.starts, CAST([] AS BIGINT[])) AS starts
               FROM w LEFT JOIN st ON w.doc_id = st.doc_id),
         k AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
                 list_filter(ws, (tk, i) ->
                   len(list_filter(starts, s -> i-1 >= s AND i-1 <= s+7)) = 0) AS kept
               FROM j)
         SELECT doc_id, n_tokens, CAST(len(kept) AS BIGINT) AS n_kept,
                -- DuckDB array_to_string of an EMPTY list is NULL; Spark's
                -- concat_ws is '' — coalesce to match (fully-excised docs)
                md5(COALESCE(array_to_string(kept, ' '), '')) AS cleaned_hash
         FROM k""",

    // Mirrors Dedup.dupSpans(w=8, minDocs=2, maxDupPct=20): every
    // position's 8-token span, doc frequency over distinct (doc, span)
    // pairs, dup positions summed per doc, cross-multiplied verdict.
    "dedup_dup_spans" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         e AS (SELECT doc_id, array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+8], ' ') AS span
               FROM w, unnest(range(0, len(ws)-7)) AS t(i) WHERE len(ws) >= 8),
         pd AS (SELECT doc_id, span, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
         ds AS (SELECT span FROM pd GROUP BY span HAVING count(*) >= 2),
         dd AS (SELECT pd.doc_id, CAST(sum(cnt) AS BIGINT) AS n_dup_spans
                FROM pd JOIN ds USING (span) GROUP BY 1)
         SELECT w.doc_id, CAST(greatest(len(ws)-7, 0) AS BIGINT) AS n_spans,
                COALESCE(n_dup_spans, 0) AS n_dup_spans,
                (COALESCE(n_dup_spans, 0) * 100 < CAST(greatest(len(ws)-7, 0) AS BIGINT) * 20
                 OR greatest(len(ws)-7, 0) = 0) AS keep
         FROM w LEFT JOIN dd ON w.doc_id = dd.doc_id""",

    // Mirrors Redact.redact over the in-plan constructed PII text: same
    // Java∩RE2 patterns, counts on the original text, mask chain in
    // url→email→ipv4→phone order with 'g' (DuckDB replaces first-only by
    // default; Spark regexp_replace is always global).
    "pii_redact" ->
      """WITH p AS (SELECT c_custkey AS doc_id,
           'doc ' || c_name
           || CASE WHEN c_custkey % 3 = 0 THEN ' mail user' || CAST(c_custkey AS VARCHAR) || '@mail' || CAST(c_custkey % 7 AS VARCHAR) || '.example.com' ELSE '' END
           || CASE WHEN c_custkey % 4 = 1 THEN ' call +86-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END
           || CASE WHEN c_custkey % 5 = 2 THEN ' host 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.' || CAST(c_custkey % 199 AS VARCHAR) ELSE '' END
           || CASE WHEN c_custkey % 2 = 0 THEN ' see https://site' || CAST(c_custkey % 50 AS VARCHAR) || '.example.org/p/' || CAST(c_custkey AS VARCHAR) ELSE '' END
           AS text FROM customer),
         c AS (SELECT doc_id, text,
           CAST(len(regexp_extract_all(text, 'https?://([A-Za-z0-9._%+-]+@)?[A-Za-z0-9.-]+(/[A-Za-z0-9._/-]*)?')) AS BIGINT) AS n_url,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}')) AS BIGINT) AS n_phone
           FROM p)
         SELECT doc_id, n_url, n_email, n_ipv4, n_phone,
                n_url + n_email + n_ipv4 + n_phone AS n_pii,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(text, 'https?://([A-Za-z0-9._%+-]+@)?[A-Za-z0-9.-]+(/[A-Za-z0-9._/-]*)?', '<URL>', 'g'),
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g'),
                  '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}', '<PHONE>', 'g') AS redacted_text
         FROM c""",

    // Mirrors DataQuality.blocklistFilter: row-local word stats, exact-int
    // IEEE division, verdict at 0.05.
    "blocklist_filter" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
                      CAST(len(list_filter(ws, x -> x = 'slow' OR x = 'drop' OR x = 'fail' OR x = 'small')) AS BIGINT) AS n_blocked
               FROM w)
         SELECT doc_id, n_words, n_blocked,
                CASE WHEN n_words > 0 THEN CAST(n_blocked AS DOUBLE) / CAST(n_words AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END AS blocked_frac,
                (CASE WHEN n_words > 0 THEN CAST(n_blocked AS DOUBLE) / CAST(n_words AS DOUBLE)
                      ELSE CAST(0 AS DOUBLE) END) <= CAST(0.05 AS DOUBLE) AS keep
         FROM c""",

    // Mirrors Quant.quantizeInt8: exact float->double casts, order-free max,
    // floor-based half-up, integer code energy, SEQUENTIAL fold for the
    // reconstruction-error sum (list_reduce init prepended per DuckDB 1.0).
    "emb_quantize" ->
      """WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
                    FROM embeddings),
         s AS (SELECT vec_id, dv,
                      list_aggregate(list_transform(dv, x -> abs(x)), 'max') / CAST(127 AS DOUBLE) AS scale
               FROM d),
         q AS (SELECT vec_id, dv, scale,
                      list_transform(dv, x -> CASE WHEN scale > 0 THEN CAST(floor(x / scale + 0.5) AS INT) ELSE 0 END) AS codes
               FROM s)
         SELECT vec_id, CAST(len(dv) AS BIGINT) AS n_dims, scale,
                list_reduce([CAST(0 AS BIGINT)] || list_transform(codes, c -> CAST(c AS BIGINT) * CAST(c AS BIGINT)),
                            (a, b) -> a + b) AS code_energy,
                list_reduce([CAST(0 AS DOUBLE)] ||
                            list_transform(list_zip(dv, codes),
                              p -> (p[1] - CAST(p[2] AS DOUBLE) * scale) * (p[1] - CAST(p[2] AS DOUBLE) * scale)),
                            (a, b) -> a + b) AS recon_err
         FROM q""",

    // Mirrors Quant.randomProject(dOut=8, dIn=64): the sign matrix is
    // rebuilt from the md5("j,k") parity formula, each coordinate is the
    // same init-0 sequential fold in input-dim order.
    "emb_rand_proj" ->
      """WITH sm AS (SELECT CAST(j AS BIGINT) AS out_dim,
                            list(CASE WHEN CAST('0x' || substring(md5(CAST(j AS VARCHAR) || ',' || CAST(k AS VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
                                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END
                                 ORDER BY k) AS signs
                     FROM range(8) t1(j), range(64) t2(k) GROUP BY 1),
         d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
               FROM embeddings)
         SELECT vec_id, out_dim,
                list_reduce([CAST(0 AS DOUBLE)] ||
                            list_transform(list_zip(dv, signs), p -> p[1] * p[2]),
                            (a, b) -> a + b) AS proj
         FROM d, sm""",

    // Mirrors Embed.hashedBow: bucket = md5[1..15] % 16, sign parity from
    // md5[16..30] — the same digest slices, exact BIGINT sums.
    "emb_hash_bow" ->
      """WITH w AS (SELECT doc_id,
                      unnest(list_filter(string_split(text, ' '),
                                         x -> length(x) > 0)) AS word
                    FROM documents),
          b AS (SELECT doc_id,
                  CAST('0x' || substring(md5(word), 1, 15) AS BIGINT) % 16 AS dim,
                  CASE WHEN CAST('0x' || substring(md5(word), 16, 15) AS BIGINT) % 2 = 0
                       THEN 1 ELSE -1 END AS s
                FROM w)
          SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS weight
          FROM b GROUP BY doc_id, dim""",

    // Mirrors Quant.int8TopK: same per-vector scale, same floor(x/s + 0.5)
    // codes, BIGINT code dot (list_reduce with a prepended 0 init), score
    // = CAST(dot AS DOUBLE) * qs * ns in the same multiply order.
    "ann_sq8_topk" ->
      """WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
                    FROM embeddings),
         s AS (SELECT vec_id, dv,
                      list_max(list_transform(dv, x -> abs(x))) / 127.0 AS sc
               FROM d),
         e AS (SELECT vec_id, sc,
                      list_transform(dv, x -> CASE WHEN sc > 0.0
                        THEN CAST(floor(x / sc + 0.5) AS INT) ELSE 0 END) AS codes
               FROM s),
         q AS (SELECT vec_id AS query_id, sc AS qs, codes AS qc FROM e WHERE vec_id < 10),
         scd AS (SELECT query_id, vec_id AS neighbor_id,
                  CAST(list_reduce([CAST(0 AS BIGINT)] ||
                         list_transform(list_zip(qc, codes),
                                        p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)),
                         (a, b) -> a + b) AS DOUBLE) * qs * e.sc AS score
                FROM e JOIN q ON query_id <> vec_id)
         SELECT query_id, neighbor_id, rank, score FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id ASC) AS rank
           FROM scd)
         WHERE rank <= 5""",

    // The digest is an implementation detail — the oracle compares the
    // columns directly (digest equality ⟺ value equality within an
    // engine, and only the VERDICT crosses engines).
    "j12_snapshot_diff" ->
      """WITH oldt AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
                       FROM orders),
         newt AS (SELECT o_orderkey, o_orderstatus,
                         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
                              ELSE o_totalprice END AS o_totalprice,
                         o_orderpriority
                  FROM orders WHERE o_orderkey % 97 <> 0
                  UNION ALL
                  SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice,
                         o_orderpriority
                  FROM orders WHERE o_orderkey % 101 = 0)
         SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                CASE WHEN o.o_orderkey IS NULL THEN 'added'
                     WHEN n.o_orderkey IS NULL THEN 'removed'
                     WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                           AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                           AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority)
                       THEN 'changed' END AS change
         FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey
         WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
                OR NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                    AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority))""",

    // Blocked Levenshtein replay: DuckDB ships the same edit-distance
    // definition; blocks capped identically.
    "dedup_edit_distance" ->
      """WITH h AS (SELECT doc_id,
                array_to_string(list_slice(list_filter(string_split(text,' '),
                  x -> length(x)>0), 1, 6), ' ') AS head,
                array_to_string(list_slice(list_filter(string_split(text,' '),
                  x -> length(x)>0), 1, 2), ' ') AS blk
              FROM documents),
         ok AS (SELECT blk FROM h GROUP BY blk HAVING COUNT(*) BETWEEN 2 AND 50),
         b AS (SELECT h.* FROM h JOIN ok USING (blk))
         SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
                CAST(levenshtein(a.head, bb.head) AS BIGINT) AS edit_dist
         FROM b a JOIN b bb ON a.blk = bb.blk AND a.doc_id < bb.doc_id
         WHERE levenshtein(a.head, bb.head) <= 8""",

    // Same pair CTEs as dedup_ngram_jaccard; the final ratio is
    // containment (÷ the SMALLER doc's shingle count, not the union).
    "dedup_containment" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
               FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
         rare AS (SELECT g.* FROM g JOIN (
                    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
                    WHERE df BETWEEN 2 AND 100) d USING (sh)),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
               FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT doc_a, doc_b, containment FROM (
           SELECT doc_a, doc_b,
                  ROUND(CAST(inter AS DOUBLE) / CAST(LEAST(sa.c, sb.c) AS DOUBLE), 6) AS containment
           FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
         WHERE containment >= 0.8""",

    "dedup_ngram_jaccard" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
               FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
         rare AS (SELECT g.* FROM g JOIN (
                    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
                    WHERE df BETWEEN 2 AND 100) d USING (sh)),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
               FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         SELECT doc_a, doc_b, jaccard FROM (
           SELECT doc_a, doc_b,
                  ROUND(CAST(inter AS DOUBLE) / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
           FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
         WHERE jaccard >= 0.5""",

    // Calibration replay: the exact-pair CTEs at threshold 0.1 + the
    // proven Md5 lane signature formula, per-pair lane-agreement count.
    "dedup_sig_calibration" -> {
      val k = 16
      val sigCols = (0 until k).map(i =>
        s"list_min(list_transform(shs, s -> ${laneSql(i, "s")})) AS sig_$i")
        .mkString(",\n                  ")
      val agree = (0 until k).map(i =>
        s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                     FROM documents),
          sh AS (SELECT doc_id,
                   list_transform(range(0, len(ws)-2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS shs
                 FROM w WHERE len(ws) >= 3),
          sigs AS (SELECT doc_id, $sigCols FROM sh),
          g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh2
                FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
          sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
          rare AS (SELECT g.* FROM g JOIN (
                     SELECT sh2 FROM (SELECT sh2, COUNT(*) AS df FROM g GROUP BY sh2)
                     WHERE df BETWEEN 2 AND 100) d USING (sh2)),
          p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                FROM rare a JOIN rare b USING (sh2)
                WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
          pairs AS (SELECT doc_a, doc_b, jaccard FROM (
                      SELECT doc_a, doc_b,
                             ROUND(CAST(inter AS DOUBLE) / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
                      FROM p JOIN sz sa ON doc_a = sa.doc_id
                              JOIN sz sb ON doc_b = sb.doc_id)
                    WHERE jaccard >= 0.1)
          SELECT p.doc_a, p.doc_b, p.jaccard,
                 CAST($agree AS BIGINT) AS n_agree,
                 CAST($agree AS DOUBLE) / 16 AS sig_est
          FROM pairs p JOIN sigs a ON p.doc_a = a.doc_id
                       JOIN sigs b ON p.doc_b = b.doc_id"""
    },

    // Recall replay: the shared LSH pair CTEs (vp) + the exact lane's
    // CTEs renamed j* (same text as dedup_ngram_jaccard over the shared
    // g = per-doc distinct shingles), then plain counts + one division.
    "dedup_recall_eval" ->
      s"""$minHashPairCtes,
          jsz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
          jrare AS (SELECT g.* FROM g JOIN (
                      SELECT sh2 FROM (SELECT sh2, COUNT(*) AS df FROM g GROUP BY sh2)
                      WHERE df BETWEEN 2 AND 100) d USING (sh2)),
          jp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                 FROM jrare a JOIN jrare b USING (sh2)
                 WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
          jv AS (SELECT doc_a, doc_b FROM (
                   SELECT doc_a, doc_b,
                          ROUND(CAST(inter AS DOUBLE)
                                / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
                   FROM jp JOIN jsz sa ON doc_a = sa.doc_id
                           JOIN jsz sb ON doc_b = sb.doc_id)
                 WHERE jaccard >= 0.5),
          m AS (SELECT jv.doc_a, jv.doc_b, vp.doc_a IS NOT NULL AS hit
                FROM jv LEFT JOIN vp ON vp.doc_a = jv.doc_a AND vp.doc_b = jv.doc_b),
          c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                        CAST(COUNT(CASE WHEN hit THEN 1 END) AS BIGINT) AS n_common
                 FROM m),
          c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lsh FROM vp)
          SELECT n_exact, n_lsh, n_common,
                 CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall
          FROM c1, c2""",

    "ann_hamming_topk" -> annHammingOracle,

    "graph_pagerank" -> pageRankOracleSql(3),

    "graph_label_prop" -> labelPropOracleSql(3),

    // Triangle counting replayed in the id-ordered (a<b<c) formulation:
    // the engine's degree ORIENTATION changes the join shape, not the
    // triangle set, so the simplest correct SQL is the oracle. The pair
    // CTEs replay ngramJaccard(3, 0.5, 100) verbatim.
    "graph_triangles" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
               FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
         rare AS (SELECT g.* FROM g JOIN (
                    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
                    WHERE df BETWEEN 2 AND 100) d USING (sh)),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
               FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         e AS (SELECT doc_a AS a, doc_b AS b FROM (
                 SELECT doc_a, doc_b,
                        ROUND(CAST(inter AS DOUBLE) / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
                 FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
               WHERE jaccard >= 0.5),
         t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM e e1 JOIN e e2 ON e1.b = e2.a
                         JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
         FROM (SELECT unnest([x, y, z]) AS node FROM t) GROUP BY node""",

    "tok_bpe_merges" -> bpeOracleSql(8),
    "tok_bpe_local" -> bpeOracleSql(8),

    "tok_bpe_encode" -> bpeEncodeOracleSql(8),

    "tok_wordpiece_encode" -> wordpieceOracleSql(8),

    // Map round-trip replay: the map is plan-internal; the observable
    // result is per-doc word counts.
    "p8_map_explode" ->
      """WITH w AS (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
             FROM documents),
          e AS (SELECT doc_id, x AS word FROM w, unnest(ws) AS t(x))
          SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM e GROUP BY doc_id, word""",

    // Pad/truncate replay: same id formula, slice, computed-count zero
    // pad, same comma-joined digest.
    "tok_pad_truncate" ->
      """WITH w AS (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
             FROM documents),
          i AS (SELECT doc_id,
               list_transform(ws, x -> CAST(length(x) * 131 + ascii(x) AS BIGINT)) AS ids
             FROM w)
          SELECT doc_id, CAST(len(ids) AS BIGINT) AS n_orig,
                 CAST(least(len(ids), 16) AS BIGINT) AS n_kept,
                 md5(array_to_string(list_transform(
                   ids[1:16] || list_transform(range(16 - least(len(ids), 16)),
                     x -> CAST(0 AS BIGINT)),
                   x -> CAST(x AS VARCHAR)), ',')) AS row_digest
          FROM i""",

    "tok_vocab_coverage" ->
      """WITH w AS (SELECT doc_id, x AS w
             FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> length(x) > 0) AS ws
                   FROM documents), unnest(ws) AS t(x)),
          v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w
                ORDER BY c DESC, w ASC LIMIT 1000),
          per AS (SELECT w.doc_id,
                    CAST(COUNT(*) AS BIGINT) AS n_tokens,
                    CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                  FROM w LEFT JOIN v ON w.w = v.w GROUP BY w.doc_id)
          SELECT d.doc_id,
                 COALESCE(per.n_tokens, 0) AS n_tokens,
                 COALESCE(per.n_oov, 0) AS n_oov,
                 CASE WHEN COALESCE(per.n_tokens, 0) > 0 THEN
                   CAST(per.n_tokens - per.n_oov AS DOUBLE)
                     / CAST(per.n_tokens AS DOUBLE) END AS coverage
          FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""",

    // Mirrors Tokenizer.unigramViterbi(UnigramVocab, unk=10, maxLen=3,
    // maxWord=512): the packed-value DP replayed with a list_reduce whose
    // accumulator is the best-prefix list (init via the leading [[0]]
    // element — rule 9's no-init workaround), vocab CASE arms rendered
    // from the same shared constant.
    "tok_unigram_viterbi" -> {
      def arms(len: Int) = UnigramVocab.filter(_._1.length == len)
        .map { case (p, c) => s"WHEN '$p' THEN $c" }.mkString(" ")
      def costCase(len: Int, sub: String) =
        if (len == 1) s"COALESCE(CASE $sub ${arms(1)} END, 10)"
        else s"CASE $sub ${arms(len)} END"
      s"""WITH w AS (SELECT doc_id,
                unnest(list_filter(string_split(text, ' '),
                                   x -> length(x) > 0 AND length(x) <= 512)) AS word
              FROM documents),
          seg AS (SELECT doc_id,
              list_reduce(
                [[CAST(0 AS BIGINT)]] ||
                  list_transform(range(1, length(word) + 1), x -> [CAST(x AS BIGINT)]),
                (acc, el) -> acc || [least(
                  acc[el[1]] + 1024 * ${costCase(1, "substring(word, CAST(el[1] AS INT), 1)")} + 1,
                  CASE WHEN el[1] >= 2 THEN acc[el[1] - 1]
                    + 1024 * ${costCase(2, "substring(word, CAST(el[1] - 1 AS INT), 2)")} + 1 END,
                  CASE WHEN el[1] >= 3 THEN acc[el[1] - 2]
                    + 1024 * ${costCase(3, "substring(word, CAST(el[1] - 2 AS INT), 3)")} + 1 END)]
              )[length(word) + 1] AS p
            FROM w),
          agg AS (SELECT doc_id, CAST(SUM(p // 1024) AS BIGINT) AS total_cost,
                         CAST(SUM(p % 1024) AS BIGINT) AS total_pieces,
                         CAST(COUNT(*) AS BIGINT) AS n_words
                  FROM seg GROUP BY doc_id)
          SELECT d.doc_id, COALESCE(a.total_cost, 0) AS total_cost,
                 COALESCE(a.total_pieces, 0) AS total_pieces,
                 COALESCE(a.n_words, 0) AS n_words
          FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN agg a USING (doc_id)"""
    },

    "dedup_clusters" ->
      """WITH RECURSIVE w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
               FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
         rare AS (SELECT g.* FROM g JOIN (
                    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
                    WHERE df BETWEEN 2 AND 100) d USING (sh)),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
               FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         pairs AS (SELECT doc_a, doc_b FROM (
                     SELECT doc_a, doc_b,
                       ROUND(CAST(inter AS DOUBLE) / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
                     FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
                   WHERE jaccard >= 0.5),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         walk(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT w2.src, e.dst FROM walk w2 JOIN edges e ON w2.dst = e.src
           WHERE w2.src <> e.dst)
         SELECT n.doc_id, LEAST(n.doc_id, MIN(t.dst)) AS label
         FROM (SELECT DISTINCT src AS doc_id FROM edges) n
         JOIN walk t ON t.src = n.doc_id
         GROUP BY n.doc_id""",

    "dedup_keep_canonical" ->
      """WITH RECURSIVE w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                    FROM documents),
         g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
               FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
         sz AS (SELECT doc_id, COUNT(*) AS c FROM g GROUP BY doc_id),
         rare AS (SELECT g.* FROM g JOIN (
                    SELECT sh FROM (SELECT sh, COUNT(*) AS df FROM g GROUP BY sh)
                    WHERE df BETWEEN 2 AND 100) d USING (sh)),
         p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
               FROM rare a JOIN rare b USING (sh) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         pairs AS (SELECT doc_a, doc_b FROM (
                     SELECT doc_a, doc_b,
                       ROUND(CAST(inter AS DOUBLE) / CAST(sa.c + sb.c - inter AS DOUBLE), 6) AS jaccard
                     FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id)
                   WHERE jaccard >= 0.5),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                   UNION SELECT doc_b, doc_a FROM pairs),
         walk(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT w2.src, e.dst FROM walk w2 JOIN edges e ON w2.dst = e.src
           WHERE w2.src <> e.dst),
         labels AS (SELECT n.doc_id, LEAST(n.doc_id, MIN(t.dst)) AS label
                    FROM (SELECT DISTINCT src AS doc_id FROM edges) n
                    JOIN walk t ON t.src = n.doc_id
                    GROUP BY n.doc_id)
         SELECT d.doc_id FROM documents d
         WHERE d.doc_id NOT IN (SELECT doc_id FROM labels WHERE label <> doc_id)""",


    "emb_near_dup" ->
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ROUND(
                   list_reduce(list_transform(list_zip(a.embedding, b.embedding), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)
                   / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
                    * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))), 6) AS cos
               FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.4""",

    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         s AS (SELECT query_id, neighbor_id,
                 ROUND(
                   list_reduce(list_transform(list_zip(qv, cv), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)
                   / (sqrt(list_reduce(list_transform(qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
                    * sqrt(list_reduce(list_transform(cv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))), 6) AS cos
               FROM c JOIN q ON query_id <> neighbor_id)
         SELECT query_id, neighbor_id, rank, cos FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM s)
         WHERE rank <= 5""",

    // MIPS replay: ann_topk's fold without the norm division — raw inner
    // product, same (ip DESC, id ASC) tie rule.
    "ann_mips_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         s AS (SELECT query_id, neighbor_id,
                 ROUND(
                   list_reduce(list_transform(list_zip(qv, cv), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y), 6) AS ip
               FROM c JOIN q ON query_id <> neighbor_id)
         SELECT query_id, neighbor_id, rank, ip FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id ASC) AS rank
           FROM s)
         WHERE rank <= 5""",

    // Pre-filter replay: the predicate lands in the corpus CTE, the fold
    // and tie rules are ann_topk's verbatim.
    "ann_filtered_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings
               WHERE vec_id % 3 = 0),
         s AS (SELECT query_id, neighbor_id,
                 ROUND(
                   list_reduce(list_transform(list_zip(qv, cv), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)
                   / (sqrt(list_reduce(list_transform(qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
                    * sqrt(list_reduce(list_transform(cv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))), 6) AS cos
               FROM c JOIN q ON query_id <> neighbor_id)
         SELECT query_id, neighbor_id, rank, cos FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM s)
         WHERE rank <= 5""",

    // Same exact fold over the SLICED first-16 prefix on both sides.
    "ann_prefix_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding[1:16] AS qv
                    FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, embedding[1:16] AS cv FROM embeddings),
         s AS (SELECT query_id, neighbor_id,
                 ROUND(
                   list_reduce(list_transform(list_zip(qv, cv), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)
                   / (sqrt(list_reduce(list_transform(qv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
                    * sqrt(list_reduce(list_transform(cv, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))), 6) AS cos
               FROM c JOIN q ON query_id <> neighbor_id)
         SELECT query_id, neighbor_id, rank, cos FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
           FROM s)
         WHERE rank <= 5""",

    "mm_binary_meta" ->
      """SELECT doc_id,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS content_hash
         FROM documents""",

    // Replays the syntheticPpm generation formula; sums are exact integers
    // and the single int/int division is bit-identical in both engines.
    "mm_decode" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS INT) AS width,
                      CAST(3 + doc_id % 4 AS INT) AS height
                    FROM documents),
         px AS (SELECT id, width, height,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height""",

    // Replays the PPM generation formula at the RESIZED sampling grid:
    // source pixel (sx, sy) = ((x·sw) DIV 8, (y·sh) DIV 6) per dest (x, y)
    // — the exact nearest-neighbor index map resizePpm computes.
    "mm_resize" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS BIGINT) AS sw,
                      CAST(3 + doc_id % 4 AS BIGINT) AS sh
                    FROM documents),
         px AS (SELECT id, sw, sh,
                  CAST(i % 8 AS BIGINT) AS x, CAST(i // 8 AS BIGINT) AS y
                FROM d, unnest(range(0, 48)) AS t(i)),
         sp AS (SELECT id, (x * sw) // 8 AS sx, (y * sh) // 6 AS sy FROM px)
         SELECT id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
                CAST(48 AS BIGINT) AS n_pixels,
                CAST(SUM((id + 3*sx + 7*sy) % 256) AS DOUBLE) / 48 AS mean_r,
                CAST(SUM((2*id + sx) % 256) AS DOUBLE) / 48 AS mean_g,
                CAST(SUM((id + sy) % 256) AS DOUBLE) / 48 AS mean_b
         FROM sp GROUP BY id""",

    // Mirrors Multimodal.aHashPpm over syntheticPpm: the generation
    // formula replayed AT the 8×8 sampled coordinates (mm_resize
    // precedent), grayscale r+g+b, strict 64·g > Σg bits packed into two
    // 32-bit halves.
    "mm_ahash" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS BIGINT) AS sw,
                      CAST(3 + doc_id % 4 AS BIGINT) AS sh
                    FROM documents),
         cells AS (SELECT id, sw, sh, CAST(i AS BIGINT) AS i,
                     ((CAST(i AS BIGINT) % 8) * sw) // 8 AS sx,
                     ((CAST(i AS BIGINT) // 8) * sh) // 8 AS sy
                   FROM d, unnest(range(0, 64)) AS t(i)),
         g AS (SELECT id, i,
                 (id + 3*sx + 7*sy) % 256 + (2*id + sx) % 256 + (id + sy) % 256 AS gray
               FROM cells),
         s AS (SELECT id, SUM(gray) AS tot FROM g GROUP BY id),
         bits AS (SELECT g.id, g.i,
                    CASE WHEN g.gray * 64 > s.tot THEN 1 ELSE 0 END AS b
                  FROM g JOIN s ON g.id = s.id)
         SELECT id, CAST(4 + id % 5 AS INT) AS width,
                CAST(3 + id % 4 AS INT) AS height,
                CAST(SUM(CASE WHEN i < 32 THEN b * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS hash_lo,
                CAST(SUM(CASE WHEN i >= 32 THEN b * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
                CAST(SUM(b) AS BIGINT) AS n_set
         FROM bits GROUP BY id""",

    // Mirrors Multimodal.dHashPpm: 9×8 sample (x over 9 columns), strict
    // right-neighbor compares, same two-half packing.
    "mm_dhash" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS BIGINT) AS sw,
                      CAST(3 + doc_id % 4 AS BIGINT) AS sh
                    FROM documents),
         cells AS (SELECT id, CAST(i AS BIGINT) AS i,
                     ((CAST(i AS BIGINT) % 8) * sw) // 9 AS sxa,
                     (((CAST(i AS BIGINT) % 8) + 1) * sw) // 9 AS sxb,
                     ((CAST(i AS BIGINT) // 8) * sh) // 8 AS sy
                   FROM d, unnest(range(0, 64)) AS t(i)),
         g AS (SELECT id, i,
                 (id + 3*sxa + 7*sy) % 256 + (2*id + sxa) % 256 + (id + sy) % 256 AS ga,
                 (id + 3*sxb + 7*sy) % 256 + (2*id + sxb) % 256 + (id + sy) % 256 AS gb
               FROM cells),
         bits AS (SELECT id, i, CASE WHEN ga > gb THEN 1 ELSE 0 END AS b FROM g)
         SELECT id, CAST(4 + id % 5 AS INT) AS width,
                CAST(3 + id % 4 AS INT) AS height,
                CAST(SUM(CASE WHEN i < 32 THEN b * (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS hash_lo,
                CAST(SUM(CASE WHEN i >= 32 THEN b * (CAST(1 AS BIGINT) << (i - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
                CAST(SUM(b) AS BIGINT) AS n_set
         FROM bits GROUP BY id""",

    // Replays syntheticPng's generation formula (dims differ from the PPM
    // fixture); the Spark side must survive deflate → filters → CRC to hit
    // these integers.
    "mm_png" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(5 + doc_id % 6 AS INT) AS width,
                      CAST(4 + doc_id % 5 AS INT) AS height
                    FROM documents),
         px AS (SELECT id, width, height,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height""",

    "mm_bmp" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(6 + doc_id % 7 AS INT) AS width,
                      CAST(3 + doc_id % 6 AS INT) AS height,
                      (doc_id % 3 = 0) AS top_down
                    FROM documents),
         px AS (SELECT id, width, height, top_down,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, top_down, COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height, top_down""",

    // Old-generation rows carry NULL for the added column.
    "src_schema_merge" ->
      """SELECT CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type,
                CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6))
                  AS DOUBLE) AS sum_value
         FROM events
         GROUP BY CASE WHEN event_id % 2 = 1 THEN event_type END""",

    "mm_tar_meta" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(2 + doc_id % 4 AS BIGINT) AS ns
                    FROM documents),
         per AS (SELECT id, ns, t.s,
                   (100 + (id + t.s) % 50) + (10 + t.s % 7)
                     + CASE WHEN t.s % 2 = 0 THEN 20 + t.s % 3 ELSE 0 END AS bytes,
                   2 + CASE WHEN t.s % 2 = 0 THEN 1 ELSE 0 END AS members
                 FROM d, unnest(range(0, ns)) AS t(s))
         SELECT id, CAST(SUM(members) AS BIGINT) AS n_members,
                CAST(SUM(bytes) AS BIGINT) AS total_bytes,
                CAST(MAX(ns) AS BIGINT) AS n_samples,
                TRUE AS all_paired
         FROM per GROUP BY id""",

    // Mirrors Zip.syntheticZip/listZip: n = 2 + id%3 members of
    // 50 + (id+s)%40 bytes; even member indexes deflate, odd store.
    "mm_zip_meta" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(2 + doc_id % 3 AS BIGINT) AS n
                    FROM documents),
         per AS (SELECT id, n, 50 + (id + t.s) % 40 AS bytes
                 FROM d, unnest(range(0, n)) AS t(s))
         SELECT id, CAST(MAX(n) AS BIGINT) AS n_members,
                CAST(SUM(bytes) AS BIGINT) AS total_bytes,
                CAST((MAX(n) + 1) // 2 AS BIGINT) AS n_deflated,
                CAST(MAX(n) // 2 AS BIGINT) AS n_stored
         FROM per GROUP BY id""",

    // Mirrors syntheticWav's sample formula ((id·31+j·17)%4096 − 2048)
    // framed at 32: the oracle recomputes the samples and the in-frame
    // neighbor sign changes directly.
    "mm_audio_frames" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(64 + doc_id % 57 AS BIGINT) AS n
                    FROM documents),
          s AS (SELECT id, t.j, ((id * 31 + t.j * 17) % 4096) - 2048 AS x,
                       t.j // 32 AS frame
                FROM d, unnest(range(0, n)) AS t(j)),
          p AS (SELECT id, frame, j, x,
                       lead(x) OVER (PARTITION BY id, frame ORDER BY j) AS nx
                FROM s)
          SELECT id, frame, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x * x) AS BIGINT) AS sum_sq,
                 CAST(SUM(CASE WHEN nx IS NOT NULL AND
                                    ((x < 0 AND nx >= 0) OR (x >= 0 AND nx < 0))
                               THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
          FROM p GROUP BY id, frame""",

    // The BFS is plan-internal — the oracle is the hop-bounded recursive
    // closure with a final distinct count.
    "graph_khop" ->
      """WITH RECURSIVE e AS (SELECT DISTINCT o_orderkey % 500 AS src,
                                     (o_orderkey * 7 + 3) % 500 AS dst
                              FROM orders),
          srcs AS (SELECT DISTINCT src AS source FROM e WHERE src % 50 = 0),
          r(source, node, hop) AS (
            SELECT source, source, 0 FROM srcs
            UNION
            SELECT r.source, e.dst, r.hop + 1
            FROM r JOIN e ON r.node = e.src WHERE r.hop < 3)
          SELECT source, CAST(COUNT(DISTINCT node) AS BIGINT) AS n_reachable
          FROM r GROUP BY source""",

    // Ground truth by full transitive closure over the symmetrized edge
    // set; component id = min reachable node. The operator reaches the
    // same labels in O(log d) pointer-halving rounds.
    "graph_cc" ->
      """WITH RECURSIVE b AS (SELECT DISTINCT o_orderkey % 900 AS n,
                                     2 + (o_orderkey % 3) * 2 AS st
                              FROM orders),
          ed AS (SELECT n AS src, n - n % 30 + (n % 30 + st) % 30 AS dst FROM b),
          e AS (SELECT src, dst FROM ed
                UNION SELECT dst AS src, src AS dst FROM ed),
          r(node, lab) AS (
            SELECT src, src FROM e
            UNION
            SELECT e.dst, r.lab FROM r JOIN e ON r.node = e.src)
          SELECT CAST(node AS BIGINT) AS node,
                 CAST(MIN(lab) AS BIGINT) AS component
          FROM r GROUP BY node""",

    // Bounded SSSP ground truth: enumerate every ≤6-hop path from the
    // seeds over the symmetrized two-rule edge set, then MIN per node.
    // UNION dedups (node, dist, hops) states so the enumeration stays
    // polynomial on this graph.
    "graph_sssp" ->
      """WITH RECURSIVE b AS (SELECT DISTINCT o_orderkey % 900 AS n,
                                     2 + (o_orderkey % 3) * 2 AS st
                              FROM orders),
          e1 AS (SELECT n AS src, n - n % 30 + (n % 30 + st) % 30 AS dst FROM b),
          e2 AS (SELECT n AS src, (n + 37) % 900 AS dst FROM b),
          ed AS (SELECT src, dst, 1 + (src + dst) % 7 AS w FROM e1
                 UNION ALL SELECT src, dst, 2 + (src + dst) % 5 AS w FROM e2),
          e AS (SELECT src, dst, w FROM ed
                UNION SELECT dst AS src, src AS dst, w FROM ed),
          r(node, dist, hops) AS (
            SELECT s, 0, 0 FROM (VALUES (0), (1), (2)) t(s)
            UNION
            SELECT e.dst, r.dist + e.w, r.hops + 1
            FROM r JOIN e ON r.node = e.src WHERE r.hops < 6)
          SELECT CAST(node AS BIGINT) AS node,
                 CAST(MIN(dist) AS BIGINT) AS dist
          FROM r GROUP BY node""",

    // Co-purchase pairs: DISTINCT memberships, oriented self-join, exact
    // pair counts with the same ≥2 floor.
    "graph_copurchase" ->
      """WITH m AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                    FROM lineitem),
          p AS (SELECT a.i AS item_a, c.i AS item_b
                FROM m a JOIN m c ON a.b = c.b AND a.i < c.i)
          SELECT item_a, item_b, CAST(COUNT(*) AS BIGINT) AS n_baskets
          FROM p GROUP BY item_a, item_b HAVING COUNT(*) >= 2""",

    "dq_freshness" ->
      s"""$MKT, lastd AS (SELECT symbol, MAX(date) AS last_date FROM bars GROUP BY symbol),
          gm AS (SELECT MAX(date) AS max_date FROM bars)
          SELECT symbol, last_date,
                 CAST(date_diff('day', last_date, max_date) AS BIGINT) AS days_behind,
                 CAST(date_diff('day', last_date, max_date) AS BIGINT) > 7 AS stale
          FROM lastd, gm""",

    "dq_calendar_gaps" ->
      s"""$MKT, g AS (SELECT symbol, date,
                        date_diff('day',
                          lag(date) OVER (PARTITION BY symbol ORDER BY date),
                          date) - 1 AS gap
                      FROM bars)
          SELECT symbol, MIN(date) AS first_date, MAX(date) AS last_date,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(date_diff('day', MIN(date), MAX(date)) + 1 - COUNT(*)
                   AS BIGINT) AS n_missing,
                 CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days
          FROM g GROUP BY symbol""",

    // Mirrors Npy.encodeOne: dims/flags by id arithmetic, sum replayed
    // over the (id + 3i + j) % 100 value formula, v_0_1 = (id+1) % 100.
    "mm_npy" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(2 + doc_id % 5 AS BIGINT) AS r,
                           CAST(3 + doc_id % 4 AS BIGINT) AS c
                    FROM documents)
          SELECT id,
                 CAST(CASE WHEN id % 2 = 0 THEN 2 ELSE 1 END AS INT) AS version,
                 MAX(r) AS rows, MAX(c) AS cols,
                 BOOL_OR(id % 5 = 0) AS fortran,
                 CAST(SUM((id + 3 * ti.i + tj.j) % 100) AS BIGINT) AS sum_vals,
                 CAST((id + 1) % 100 AS BIGINT) AS v_0_1
          FROM d, unnest(range(0, r)) AS ti(i), unnest(range(0, c)) AS tj(j)
          GROUP BY id""",

    // Mirrors Ico.entryShape/pixel: per-entry dims (256×2 on the
    // fifth-id first entry), kind by (id+e) parity, means replayed from
    // the +e-offset pixel formulas with one final division each.
    "mm_ico" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(1 + doc_id % 3 AS BIGINT) AS n
                    FROM documents),
          en AS (SELECT id, CAST(t.e AS INT) AS entry,
                        CASE WHEN (id + t.e) % 2 = 0 THEN 'png' ELSE 'dib' END AS kind,
                        CASE WHEN id % 5 = 0 AND t.e = 0 THEN 256
                             ELSE CAST(4 + (id + t.e) % 5 AS INT) END AS width,
                        CASE WHEN id % 5 = 0 AND t.e = 0 THEN 2
                             ELSE CAST(3 + (2 * id + t.e) % 4 AS INT) END AS height
                 FROM d, unnest(range(0, n)) AS t(e)),
          px AS (SELECT id, entry, kind, width, height,
                        CAST(i % width AS BIGINT) AS x,
                        CAST(i // width AS BIGINT) AS y
                 FROM en, unnest(range(0, width * height)) AS t2(i))
          SELECT id, entry, kind, width, height, COUNT(*) AS n_pixels,
                 CAST(SUM((id + entry + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                 CAST(SUM((2*id + entry + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                 CAST(SUM((id + entry + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
          FROM px GROUP BY id, entry, kind, width, height""",

    // Histogram replay: the pixel formulas binned with integer DIV,
    // conditional counts against the crossed bin domain.
    "mm_histogram" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS INT) AS width,
                      CAST(3 + doc_id % 4 AS INT) AS height
                    FROM documents),
         px AS (SELECT id,
                  (id + 3*(i % width) + 7*(i // width)) % 256 AS r,
                  (2*id + (i % width)) % 256 AS g,
                  (id + (i // width)) % 256 AS bl
                FROM d, unnest(range(0, width * height)) AS t(i)),
         bins AS (SELECT CAST(x AS INT) AS bin FROM unnest(range(0, 8)) AS t(x))
         SELECT id, bin,
                CAST(SUM(CASE WHEN r // 32 = bin THEN 1 ELSE 0 END) AS BIGINT) AS r_count,
                CAST(SUM(CASE WHEN g // 32 = bin THEN 1 ELSE 0 END) AS BIGINT) AS g_count,
                CAST(SUM(CASE WHEN bl // 32 = bin THEN 1 ELSE 0 END) AS BIGINT) AS b_count
         FROM px CROSS JOIN bins
         GROUP BY id, bin""",

    // Mirrors Ogg.shape: serial/pages/granule formulas; packets sum the
    // per-page count over the page range.
    "mm_ogg_meta" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(1 + doc_id % 3 AS BIGINT) AS n
                    FROM documents),
          pk AS (SELECT id, CAST(SUM(1 + (id + t.p) % 3) AS BIGINT) AS n_packets
                 FROM d, unnest(range(0, n)) AS t(p) GROUP BY id)
          SELECT d.id, CAST(1000 + d.id % 97 AS BIGINT) AS serial,
                 CAST(d.n AS INT) AS n_pages, pk.n_packets,
                 (d.id + 1) * 1000 * d.n AS granule_last
          FROM d JOIN pk USING (id)""",

    // Mirrors Pdf.shape: version/pages/dims formulas; n_objects counts
    // catalog + pages + page objects + the Info extra on id ≡ 0 (mod 3).
    "mm_pdf_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CASE WHEN doc_id % 2 = 0 THEN '1.4' ELSE '1.7' END AS version,
                CAST(2 + (1 + doc_id % 4)
                     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INT) AS n_objects,
                CAST(1 + doc_id % 4 AS INT) AS n_pages,
                CAST(400 + doc_id % 200 AS INT) AS page_w,
                CAST(500 + (3 * doc_id) % 300 AS INT) AS page_h
         FROM documents""",

    // Mirrors Webp.shape: kind/dims/alpha/chunk-count formulas.
    "mm_webp_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CASE doc_id % 3 WHEN 0 THEN 'vp8' WHEN 1 THEN 'vp8l'
                     ELSE 'vp8x' END AS kind,
                CAST(16 + doc_id % 31 AS INT) AS width,
                CAST(9 + (2 * doc_id) % 17 AS INT) AS height,
                (doc_id % 3 <> 0 AND doc_id % 2 = 0) AS has_alpha,
                CAST(CASE WHEN doc_id % 3 < 2 THEN 1
                          WHEN doc_id % 4 = 0 THEN 3 ELSE 2 END AS INT) AS n_chunks
         FROM documents""",

    // Mirrors Mp3Meta.encodeOne: frame count / samplerate / per-frame
    // bitrate formulas, the kbps table as a 1-based list literal, exact
    // integer-DIV duration.
    "mm_mp3_meta" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(3 + doc_id % 6 AS BIGINT) AS n
                    FROM documents),
          sr AS (SELECT id, n,
                        CASE id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                             ELSE 32000 END AS samplerate
                 FROM d),
          fr AS (SELECT id, n, samplerate,
                        CASE WHEN id % 4 = 0 THEN 1 + id % 14
                             ELSE 1 + (id + t.j) % 14 END AS bi
                 FROM sr, unnest(range(0, n)) AS t(j)),
          br AS (SELECT id, n, samplerate,
                        [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
                          [CAST(bi AS INT)] AS kbps
                 FROM fr)
          SELECT id, id % 2 = 0 AS has_id3,
                 CAST(CASE WHEN id % 2 = 0 THEN 20 + id % 50 ELSE 0 END
                   AS BIGINT) AS id3_size,
                 MAX(n) AS n_frames,
                 CAST(MAX(samplerate) AS BIGINT) AS samplerate,
                 CAST(SUM(kbps) AS BIGINT) AS sum_kbps,
                 COUNT(DISTINCT kbps) > 1 AS vbr,
                 CAST(MAX(n) * 1152 * 1000000 // MAX(samplerate) AS BIGINT)
                   AS duration_us
          FROM br GROUP BY id""",

    // Mirrors Srt.encodeOne: cue duration/line-count formulas, text-char
    // totals via reconstructing the same cue lines; starts ascend by
    // construction so monotonic is TRUE (the spec covers the false case).
    "mm_srt_meta" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                           CAST(2 + doc_id % 4 AS BIGINT) AS n
                    FROM documents),
          cue AS (SELECT id, t.j,
                         t.j * 4000 + id % 1000 AS start_ms,
                         1500 + (id + t.j) % 2000 AS dur,
                         1 + (id + t.j) % 3 AS nl
                  FROM d, unnest(range(0, n)) AS t(j)),
          ln AS (SELECT id, j, start_ms, dur,
                        CAST(length('w' || id || ' line' || j || ' t' || k.k)
                          AS BIGINT) AS lc
                 FROM cue, unnest(range(0, nl)) AS k(k)),
          per AS (SELECT id, j, MAX(start_ms) AS s, MAX(dur) AS dur,
                         SUM(lc) AS chars
                  FROM ln GROUP BY id, j)
          SELECT id, CAST(COUNT(*) AS BIGINT) AS n_cues,
                 CAST(SUM(dur) AS BIGINT) AS total_ms,
                 CAST(SUM(chars) AS BIGINT) AS n_text_chars,
                 CAST(MAX(s + dur) AS BIGINT) AS max_end_ms,
                 TRUE AS monotonic
          FROM per GROUP BY id""",

    // Mirrors Exif.exifPayload: endian by id parity, orientation 1+id%8,
    // SHORT dims, DateTimeOriginal at offset for id%3==0 (5 tags vs 4).
    "mm_exif" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                doc_id % 2 = 1 AS big_endian,
                CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
                CAST(100 + doc_id % 50 AS BIGINT) AS exif_w,
                CAST(80 + doc_id % 40 AS BIGINT) AS exif_h,
                CAST(CASE WHEN doc_id % 3 = 0 THEN 5 ELSE 4 END AS BIGINT) AS n_tags,
                CASE WHEN doc_id % 3 = 0
                  THEN '1997:01:' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                       || ' 12:00:00' END AS datetime
         FROM documents""",

    "mm_mp4_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CAST(1 + doc_id % 2 AS INT) AS n_tracks,
                CAST(16 * (1 + doc_id % 4) AS INT) AS width,
                CAST(16 * (1 + doc_id % 3) AS INT) AS height,
                CAST(1000 * (1 + doc_id % 3) AS BIGINT) AS timescale,
                CAST((500 * (1 + doc_id % 7)) * 1000
                     // (1000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms,
                CAST(5 + (1 + doc_id % 2) AS BIGINT) AS n_boxes
         FROM documents""",

    "mm_mkv_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CAST(1 + doc_id % 2 AS INT) AS n_tracks,
                CAST(320 + 16 * (doc_id % 8) AS INT) AS width,
                CAST(240 + 8 * (doc_id % 6) AS INT) AS height,
                CAST(1000000 * (1 + doc_id % 3) AS BIGINT) AS timestamp_scale,
                CAST(500 * (1 + doc_id % 7) * (1 + doc_id % 3) AS BIGINT) AS duration_ms,
                CAST(13 + 3 * (doc_id % 2) AS BIGINT) AS n_elements
         FROM documents""",

    "mm_ttf_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CAST(2 + doc_id % 2 AS INT) AS n_tables,
                CAST(1000 + 24 * (doc_id % 5) AS INT) AS units_per_em,
                CAST(100 + doc_id % 50 AS INT) AS n_glyphs,
                CAST(-(doc_id % 100) AS INT) AS x_min,
                CAST(-(doc_id % 80) AS INT) AS y_min,
                CAST(1000 + doc_id % 200 AS INT) AS x_max,
                CAST(900 + doc_id % 150 AS INT) AS y_max
         FROM documents""",

    "mm_h264_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                66 AS profile_idc, 30 AS level_idc,
                CAST((1 + doc_id % 4) * 16 - 2 * (doc_id % 3) AS INT) AS width,
                CAST((1 + doc_id % 3) * 16 - 2 * (doc_id % 2) AS INT) AS height,
                CAST(2 + (1 + doc_id % 3) + (doc_id % 5) AS BIGINT) AS n_nal,
                CAST(1 + doc_id % 3 AS BIGINT) AS n_idr,
                CAST(doc_id % 5 AS BIGINT) AS n_nonidr
         FROM documents""",

    // H.264 slice decode replay: DC-only residuals make every MB flat, so
    // the reconstruction is the per-MB recurrence v = clip(pred + r) with
    // pred = DC of reconstructed left/top neighbors and r = (32c+32)>>6 at
    // QP 46 — folded raster-order as ONE running-list reduce per clip
    // (rule 9: one list_reduce per query, per-key shape, never per-row
    // prefixes). The element carries [r, hasLeft, hasTop, mbW]; top is
    // acc[len-mbW+1]. Chroma is provably flat 128 (no residual anywhere).
    "mm_h264_px" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(1 + doc_id % 4 AS INT) AS mbw,
                      CAST((1 + doc_id % 4) * (1 + doc_id % 3) AS INT) AS n
                    FROM documents),
         g AS (SELECT id, mbw, n,
                 list_transform(range(0, CAST(n AS BIGINT)), k -> [
                   CAST(floor((32 * (CASE WHEN k = 0 AND id % 4 = 0 THEN 100
                     ELSE ((id + 7 * k) % 29) - 14 END) + 32) / 64.0) AS DOUBLE),
                   CAST(CASE WHEN k % mbw > 0 THEN 1 ELSE 0 END AS DOUBLE),
                   CAST(CASE WHEN k >= mbw THEN 1 ELSE 0 END AS DOUBLE),
                   CAST(mbw AS DOUBLE)]) AS els
               FROM d),
         f AS (SELECT id, mbw, n,
                 list_reduce([CAST([] AS DOUBLE[])] || els,
                   (acc, el) -> acc || [LEAST(255.0, GREATEST(0.0,
                     CASE WHEN el[2] = 1 AND el[3] = 1
                            THEN floor((list_extract(acc, len(acc)) +
                                        list_extract(acc, len(acc) - CAST(el[4] AS INT) + 1)
                                        + 1) / 2.0)
                          WHEN el[2] = 1 THEN list_extract(acc, len(acc))
                          WHEN el[3] = 1
                            THEN list_extract(acc, len(acc) - CAST(el[4] AS INT) + 1)
                          ELSE 128.0 END + el[1]))]) AS run
               FROM g)
         SELECT id,
                CAST(k % mbw AS INT) AS mb_x,
                CAST(k // mbw AS INT) AS mb_y,
                CAST(v AS INT) AS y_val,
                CAST(0 AS INT) AS y_spread,
                CAST(128 AS INT) AS cb_val,
                CAST(128 AS INT) AS cr_val,
                CAST(0 AS INT) AS c_spread
         FROM (SELECT id, mbw,
                 UNNEST(range(0, CAST(n AS BIGINT))) AS k,
                 UNNEST(run) AS v
               FROM f)""",

    "mm_tiff" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(5 + doc_id % 8 AS INT) AS width,
                      CAST(4 + doc_id % 5 AS INT) AS height,
                      (doc_id % 2 = 0) AS big_endian,
                      (doc_id % 3 = 0) AS packbits
                    FROM documents),
         px AS (SELECT id, width, height, big_endian, packbits,
                  CAST((height + 2) // 3 AS INT) AS n_strips,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, big_endian, packbits, n_strips,
                COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height, big_endian, packbits, n_strips""",

    // JPEG is lossy, so the oracle replays the exact header fields and the
    // EXPECTATION that every decoded channel mean sits inside the ±3.0
    // budget (TRUE per boolean) — decode drift flips a boolean, a dropped
    // row fails rows_match.
    "mm_jpeg" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
                CAST(5 + doc_id % 9 AS INT) AS width,
                CAST(4 + doc_id % 9 AS INT) AS height,
                CAST((5 + doc_id % 9) * (4 + doc_id % 9) AS BIGINT) AS n_pixels,
                TRUE AS mean_r_ok, TRUE AS mean_g_ok, TRUE AS mean_b_ok
         FROM documents""",

    // Per-frame replay of the MJPEG-AVI fixture: frame index from the
    // declared frame count, booleans expected TRUE (mm_jpeg lossy-gate
    // pattern). A dropped/duplicated frame fails rows_match.
    "mm_video" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(5 + doc_id % 9 AS INT) AS width,
                      CAST(4 + doc_id % 9 AS INT) AS height,
                      CAST(2 + doc_id % 4 AS INT) AS n_frames
                    FROM documents)
         SELECT id, CAST(t AS INT) AS frame, n_frames, width, height,
                TRUE AS mean_r_ok, TRUE AS mean_g_ok, TRUE AS mean_b_ok
         FROM d, unnest(range(0, n_frames)) AS u(t)""",

    // Every-2nd-frame sampling over the same per-frame expansion — row
    // membership is the whole check.
    "mm_frame_sample" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(5 + doc_id % 9 AS INT) AS width,
                      CAST(4 + doc_id % 9 AS INT) AS height,
                      CAST(2 + doc_id % 4 AS INT) AS n_frames
                    FROM documents)
         SELECT id, CAST(t AS INT) AS frame, n_frames, width, height
         FROM d, unnest(range(0, n_frames)) AS u(t)
         WHERE t % 2 = 0""",

    // Replays syntheticGif's pixel formula through the palette formulas
    // (r=i, g=(2i)%256, b=255-i over index (id+3x+7y)%256) — integer sums,
    // exact in both engines.
    "mm_gif" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(5 + doc_id % 7 AS INT) AS width,
                      CAST(4 + doc_id % 6 AS INT) AS height
                    FROM documents),
         px AS (SELECT id, width, height,
                  (id + 3*(i % width) + 7*(i // width)) % 256 AS ci
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, COUNT(*) AS n_pixels,
                CAST(SUM(ci) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*ci) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM(255 - ci) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height""",

    // The zstd round trip lands on the same formula replay as mm_gzip —
    // byte-identical decompress through the real zstd-jni lane.
    "mm_zstd" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS INT) AS width,
                      CAST(3 + doc_id % 4 AS INT) AS height
                    FROM documents),
         px AS (SELECT id, width, height,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height""",

    // The gzip round trip must land on the same formula replay as
    // mm_decode — byte-identical inflate is exactly what's being proven.
    "mm_gzip" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(4 + doc_id % 5 AS INT) AS width,
                      CAST(3 + doc_id % 4 AS INT) AS height
                    FROM documents),
         px AS (SELECT id, width, height,
                  CAST(i % width AS BIGINT) AS x, CAST(i // width AS BIGINT) AS y
                FROM d, unnest(range(0, width * height)) AS t(i))
         SELECT id, width, height, COUNT(*) AS n_pixels,
                CAST(SUM((id + 3*x + 7*y) % 256) AS DOUBLE) / COUNT(*) AS mean_r,
                CAST(SUM((2*id + x) % 256) AS DOUBLE) / COUNT(*) AS mean_g,
                CAST(SUM((id + y) % 256) AS DOUBLE) / COUNT(*) AS mean_b
         FROM px GROUP BY id, width, height""",

    // Replays the same generation formula as mm_wav — FLAC is lossless,
    // so the Spark side must round-trip rice-coded prediction residuals
    // and both CRCs bit-perfectly to reproduce these numbers.
    "mm_flac" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                      CAST(64 + doc_id % 57 AS BIGINT) AS n
                    FROM documents),
         sm AS (SELECT id, sample_rate, (id*31 + j*17) % 4096 - 2048 AS s
                FROM d, unnest(range(0, n)) AS t(j))
         SELECT id, sample_rate, COUNT(*) AS n_samples,
                CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_amp,
                MAX(ABS(s)) AS peak_amp
         FROM sm GROUP BY id, sample_rate""",

    // Replays Multimodal.syntheticWav's generation formula — the Spark
    // side must round-trip real RIFF bytes to reproduce these numbers.
    "mm_wav" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS id,
                      CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
                      CAST(64 + doc_id % 57 AS BIGINT) AS n
                    FROM documents),
         sm AS (SELECT id, sample_rate, (id*31 + j*17) % 4096 - 2048 AS s
                FROM d, unnest(range(0, n)) AS t(j))
         SELECT id, sample_rate, COUNT(*) AS n_samples,
                CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_amp,
                MAX(ABS(s)) AS peak_amp
         FROM sm GROUP BY id, sample_rate""",

    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms, value
                    FROM events),
         m AS (SELECT *,
                 CASE WHEN tms - LAG(tms) OVER w > 1800000
                        OR LAG(tms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         s AS (SELECT *,
                 -- CAST: DuckDB SUM(INTEGER) yields HUGEINT, which its
                 -- pandas/arrow export renders unlike Spark's BIGINT and
                 -- breaks the driver's hash compare (values still equal).
                 CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM m)
         SELECT user_id, session_id, COUNT(*) AS n_events,
                MIN(tms) AS start_ms, MAX(tms) AS end_ms,
                CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS session_value
         FROM s GROUP BY user_id, session_id""",

    // Session paths: sessionize CTEs + per-session ordered type list.
    "events_path_topk" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000000 AS tms,
                           event_type
                    FROM events),
         m AS (SELECT *,
                 CASE WHEN tms - LAG(tms) OVER w > 1800000
                        OR LAG(tms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
               FROM e
               WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         s AS (SELECT *,
                 CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
               FROM m),
         p AS (SELECT array_to_string(
                 list_transform(
                   list_sort(list(
                     lpad(CAST(tms AS VARCHAR), 14, '0')
                       || lpad(CAST(event_id AS VARCHAR), 14, '0')
                       || event_type)),
                   x -> x[29:]), '>') AS path
               FROM s GROUP BY user_id, session_id),
         g AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
               FROM p GROUP BY path)
         SELECT path, n_sessions, rank FROM (
           SELECT *, CAST(ROW_NUMBER() OVER (
             ORDER BY n_sessions DESC, path ASC) AS BIGINT) AS rank FROM g)
         WHERE rank <= 20""",

    "pivot_matrix" ->
      """SELECT CAST(ts AS DATE) AS date,
                CAST(CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(25,6)) END) AS DECIMAL(25,6)) AS DOUBLE) AS click,
                CAST(CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(25,6)) END) AS DECIMAL(25,6)) AS DOUBLE) AS error,
                CAST(CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(25,6)) END) AS DECIMAL(25,6)) AS DOUBLE) AS purchase,
                CAST(CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(25,6)) END) AS DECIMAL(25,6)) AS DOUBLE) AS signup,
                CAST(CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(25,6)) END) AS DECIMAL(25,6)) AS DOUBLE) AS view
         FROM events GROUP BY CAST(ts AS DATE)""",

    "dedup_minhash_lsh" -> minHashLshOracle,

    "dedup_incremental" -> dedupIncrementalOracle,
    // stream-built index ≡ batch-built index: same final artifact content
    // (base 60% + streamed 20% = exactly the %5≠4 corpus), same batch,
    // same verdict semantics — the oracle is shared verbatim
    "stream_index_append" -> dedupIncrementalOracle,
    "dedup_lsh_delete" -> dedupLshDeleteOracle,
    "dedup_lsh_update" -> dedupLshUpdateOracle,
    "dedup_simhash" -> simHashOracle,
    "ann_ivf0_topk" -> ivf0Oracle,
    "semdedup" -> semDedupOracle,
    "ann_pq_topk" -> pqOracle,

    "ann_opq_topk" -> opqOracle,
    "ann_ivfpq_topk" -> ivfPqOracle,
    "ann_recall_eval" -> annRecallOracle,
    "ann_ndcg_eval" -> annNdcgOracle,
    // Served lane reads a pre-materialized index; the artifacts round-trip
    // parquet bit-exactly, so the inline-build oracle replays it unchanged.
    "ann_ivfpq_served" -> ivfPqOracle,
    // filtered serve: scoring membership restricted to the predicate —
    // the tombstone-replay servePred lane with a value predicate
    "ann_ivfpq_filtered" -> ivfPqOracleTrained("TRUE",
      servePred = "e.cid % 3 = 0"),
    "ann_ivfpq_append" -> ivfPqOracleTrained("cid % 5 <> 4"),
    // stream-grown index ≡ batch-appended index (encode-only appends are
    // row-local given frozen quantizers) — ann_ivfpq_append's oracle verbatim
    "stream_ann_append" -> ivfPqOracleTrained("cid % 5 <> 4"),
    // update lane: trained on the ORIGINAL full corpus; the served corpus
    // carries the replacement (negated) vectors for the updated ids —
    // delete+compact+append ≡ encode-the-modified-corpus with frozen
    // quantizers.
    "ann_ivfpq_update" -> ivfPqOracleTrainedTail("TRUE",
      """SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5""",
      cvExpr = "CASE WHEN vec_id % 5 = 2 " +
        "THEN list_transform(embedding, x -> -x) ELSE embedding END"),
    // delete lane: trained on the FULL corpus, serving only survivors
    "ann_ivfpq_delete" -> ivfPqOracleTrainedTail("TRUE",
      """SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5""", servePred = "e.cid % 5 <> 3"),
    "ann_ivfpq_rerank" -> ivfPqRerankOracle,
    "ann_ivfpq_res_topk" -> ivfPqResOracle,
    "ann_ivfpq_res_append" -> ivfPqResOracleTrained("cid % 5 <> 4"),
    "ann_ivfpq_res_served" -> ivfPqResOracle,
    "ann_ivf_topk" -> ivf1Oracle,
    "ann_graph_topk" -> graphAnnOracle,
    "ann_graph_served" -> graphAnnOracle,
    "ann_graph_append" -> graphAnnAppendOracle,
    // single-epoch stream append is content-identical to the batch append
    // (StreamingSpec pins it, plus multi-epoch ≡ sequential appends) — the
    // gate shares the oracle verbatim, the stream_ann_append precedent
    "stream_graph_append" -> graphAnnAppendOracle,
    "ann_lsh_topk" -> annLshOracle,
    "emb_near_dup_lsh" -> embLshOracle,
  )

  // ----------------------------------------------- generated oracle SQL
  // These three oracles replay hash-heavy plans, so their SQL is built with
  // small Scala loops (16 minhash lanes, 32 simhash bits) instead of being
  // written out longhand.

  /** DuckDB replay of [[graft.ops.Graph.pageRank]] with the iterations
    * UNROLLED as CTE blocks (fixed iteration count ⇒ no recursion needed):
    * same integer grid (Scale 10¹²), same `//` truncation points — the
    * contrib split, the damping `(Σ·85)//100` (multiply first, one
    * truncation), and the base `((Scale·15)//100)//n`. All BIGINT → exact. */
  private def pageRankOracleSql(iters: Int): String = {
    val S = graft.ops.Graph.Scale
    val head =
      s"""WITH p AS (SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c,
                  'S' || CAST(l_suppkey AS VARCHAR) AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT c AS src, s AS dst FROM p
               UNION ALL SELECT s AS src, c AS dst FROM p),
         nodes AS (SELECT DISTINCT u AS node
                   FROM (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)),
         nn AS (SELECT COUNT(*) AS n FROM nodes),
         deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src),
         r0 AS (SELECT node, $S // n AS rank_fp FROM nodes, nn)"""
    val its = (1 to iters).map { i =>
      s""",
         m$i AS (SELECT e.dst, CAST(SUM(r.rank_fp // d.out_deg) AS BIGINT) AS msg
                FROM e JOIN r${i - 1} r ON e.src = r.node
                       JOIN deg d ON e.src = d.src
                GROUP BY e.dst),
         r$i AS (SELECT nodes.node,
                  CAST(($S * 15 // 100) // nn.n
                    + (COALESCE(m$i.msg, 0) * 85) // 100 AS BIGINT) AS rank_fp
                FROM nodes CROSS JOIN nn
                LEFT JOIN m$i ON m$i.dst = nodes.node)"""
    }.mkString
    s"$head$its SELECT node, rank_fp FROM r$iters"
  }

  /** DuckDB replay of [[graft.quality.Relevance.searchTopK]](k=10):
    * the text_bm25 component tree per query over the union term set, a
    * ROW_NUMBER cut under the (score DESC, doc_id ASC) total order. */
  private lazy val searchTopKOracle: String = {
    val allTerms = SearchQueries.flatMap(_._2).distinct
    def comp(t: String): String =
      s"""((CAST(n AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5) + 1.0)
          * (CAST(tf_$t AS DOUBLE) * (1.2 + 1.0))
          / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))"""
    val tfCols = allTerms.map(t =>
      s"CAST(len(list_filter(string_split(text,' '), x -> x = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n              ")
    val dfCols = allTerms.map(t =>
      s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t")
      .mkString(",\n              ")
    val blocks = SearchQueries.map { case (qid, terms) =>
      val score = terms.map(comp).mkString(" + ")
      s"""SELECT query_id, doc_id, score, rank FROM (
            SELECT '$qid' AS query_id, doc_id, $score AS score,
                   ROW_NUMBER() OVER (ORDER BY $score DESC, doc_id ASC) AS rank
            FROM base CROSS JOIN stats)
          WHERE rank <= 10"""
    }.mkString("\n         UNION ALL ")
    s"""WITH base AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text,' '), x -> length(x)>0)) AS BIGINT) AS dl,
              $tfCols
            FROM documents),
         stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl,
              $dfCols
            FROM base)
         $blocks"""
  }

  /** DuckDB replay of [[graft.ops.Graph.labelPropagation]](iters):
    * neighbor-majority votes with the (count DESC, label ASC) total-order
    * argmax per round, rounds unrolled as CTE blocks; no-in-edge nodes
    * carry the previous label via the left join. */
  private def labelPropOracleSql(iters: Int): String = {
    val head =
      """WITH p AS (SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS c,
                  'S' || CAST(l_suppkey AS VARCHAR) AS s
           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         e AS (SELECT c AS src, s AS dst FROM p
               UNION ALL SELECT s AS src, c AS dst FROM p),
         nodes AS (SELECT DISTINCT u AS node
                   FROM (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)),
         l0 AS (SELECT node, node AS label FROM nodes)"""
    val its = (1 to iters).map { i =>
      s""",
         v$i AS (SELECT e.dst, l.label, COUNT(*) AS n_votes
                FROM e JOIN l${i - 1} l ON e.src = l.node
                GROUP BY e.dst, l.label),
         w$i AS (SELECT dst, label AS new_label FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY dst
                             ORDER BY n_votes DESC, label ASC) AS rn FROM v$i)
                WHERE rn = 1),
         l$i AS (SELECT l.node, COALESCE(w$i.new_label, l.label) AS label
                FROM l${i - 1} l LEFT JOIN w$i ON w$i.dst = l.node)"""
    }.mkString
    s"$head$its SELECT node, label FROM l$iters"
  }

  /** DuckDB replay of [[graft.functions.Tokenizer.trainBpe]](nMerges):
    * the merge rounds unroll as generated CTE blocks (pageRank
    * precedent). chr(1) is the symbol separator; replace() is
    * left-to-right non-overlapping in both engines, and the
    * DOUBLE-delimited encoding (`␁sym␁` per symbol, merge pattern
    * `␁l␁␁r␁ → ␁lr␁`) makes that exactly the scalar BPE merge
    * application — boundary-exact on BOTH sides, so a symbol that merely
    * starts with `r` can't be falsely consumed (the r10 ADVICE bug).
    * All counts integer, tiebreaks binary-collated. */
  private def bpeOracleSql(nMerges: Int): String = {
    val head =
      """WITH wf AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
             FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS w
                   FROM documents)
             WHERE NOT contains(w, chr(1))
             GROUP BY w),
         w0 AS (SELECT array_to_string(
                    list_transform(range(1, length(word) + 1),
                                   i -> chr(1) || substring(word, CAST(i AS INT), 1) || chr(1)),
                    '') AS w, freq
                FROM wf)"""
    val rounds = (1 to nMerges).map { k =>
      s""",
         p$k AS (SELECT pr[1] AS lft, pr[2] AS rgt, CAST(sum(freq) AS BIGINT) AS cnt
                 FROM (SELECT freq, unnest(list_zip(syms, syms[2:])) AS pr
                       FROM (SELECT freq, list_filter(string_split(w, chr(1)), s -> length(s) > 0) AS syms
                             FROM w${k - 1}))
                 WHERE pr[2] IS NOT NULL
                 GROUP BY 1, 2),
         b$k AS (SELECT lft, rgt, cnt FROM p$k
                 ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
         w$k AS (SELECT replace(w, chr(1) || lft || chr(1) || chr(1) || rgt || chr(1),
                                chr(1) || lft || rgt || chr(1)) AS w, freq
                 FROM w${k - 1}, b$k)"""
    }.mkString
    val out = (1 to nMerges).map { k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, lft, rgt, cnt AS pair_count FROM b$k"
    }.mkString("\n         UNION ALL ")
    s"$head$rounds\n         $out"
  }

  /** DuckDB replay of [[graft.functions.Tokenizer.wordpieceEncode]] over
    * [[graft.functions.Tokenizer.wordpieceVocab]]: the bpe oracle's merge
    * CTEs build the vocabulary (products + corpus chars minus 'q'), then a
    * recursive CTE walks each DISTINCT word greedily — the per-step choice
    * is `MAX(lpad(len) || piece)` over prefix-matching pieces (one
    * substring exists per length, so max-by-sortkey IS longest-match), a
    * stuck word (max pos < length) collapses to one <unk>. */
  private def wordpieceOracleSql(nMerges: Int): String = {
    val prelude = bpeOracleSql(nMerges)
      .split("\n         SELECT CAST\\(1 AS BIGINT\\)")(0)
      .replaceFirst("WITH wf", "WITH RECURSIVE wf")
    val prods = (1 to nMerges).map(k => s"SELECT lft || rgt AS piece FROM b$k")
      .mkString("\n               UNION ")
    s"""$prelude,
         chars AS (SELECT DISTINCT substring(word, CAST(i AS INT), 1) AS piece
                   FROM wf, unnest(range(1, length(word) + 1)) AS t(i)
                   WHERE substring(word, CAST(i AS INT), 1) <> 'q'),
         vocab AS (SELECT piece FROM chars UNION $prods),
         steps(word, pos, ntoks) AS (
           SELECT word, 0, 0 FROM wf
           UNION ALL
           SELECT word,
                  pos + length(substr((SELECT MAX(lpad(CAST(length(piece) AS VARCHAR), 4, '0') || piece)
                                       FROM vocab
                                       WHERE substring(word, pos + 1, length(piece)) = piece), 5)),
                  ntoks + 1
           FROM steps
           WHERE pos < length(word)
             AND EXISTS (SELECT 1 FROM vocab
                         WHERE substring(word, pos + 1, length(piece)) = piece)),
         fin AS (SELECT word, MAX(pos) AS reached, MAX(ntoks) AS nt
                 FROM steps GROUP BY word),
         wtok AS (SELECT f.word,
                    CASE WHEN f.reached = length(f.word) THEN f.nt ELSE 1 END AS word_toks,
                    CASE WHEN f.reached = length(f.word) THEN 0 ELSE 1 END AS unk
                  FROM fin f),
         dw AS (SELECT doc_id, w AS word
                FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS w
                      FROM documents)
                WHERE NOT contains(w, chr(1)))
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
                CAST(SUM(word_toks) AS BIGINT) AS n_tokens,
                CAST(SUM(unk) AS BIGINT) AS n_unk
         FROM dw JOIN wtok USING (word)
         GROUP BY doc_id"""
  }

  /** DuckDB replay of [[graft.functions.Tokenizer.trainAndEncodeBpe]]:
    * the training CTEs of [[bpeOracleSql]] (their b1..bN single-row merge
    * tables), then every doc's words re-encoded by applying the merges in
    * rank order — the same ascending replace chain, cross-joining the N
    * one-row CTEs for the rule literals. */
  private def bpeEncodeOracleSql(nMerges: Int): String = {
    // reuse the training prelude verbatim (everything before the final SELECT)
    val prelude = bpeOracleSql(nMerges).split("\n         SELECT CAST\\(1 AS BIGINT\\)")(0)
    val chain = (1 to nMerges).foldLeft("enc0") { (acc, k) =>
      s"replace($acc, chr(1) || b$k.lft || chr(1) || chr(1) || b$k.rgt || chr(1), chr(1) || b$k.lft || b$k.rgt || chr(1))"
    }
    val joins = (1 to nMerges).map(k => s"b$k").mkString(", ")
    s"""$prelude,
         dw AS (SELECT doc_id,
                       array_to_string(
                         list_transform(range(1, length(word) + 1),
                                        i -> chr(1) || substring(word, CAST(i AS INT), 1) || chr(1)),
                         '') AS enc0
                FROM (SELECT doc_id,
                             unnest(list_filter(string_split(text, ' '), x -> length(x) > 0)) AS word
                      FROM documents)
                WHERE NOT contains(word, chr(1))),
         de AS (SELECT doc_id, $chain AS enc FROM dw, $joins)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(len(list_filter(string_split(enc, chr(1)), s -> length(s) > 0))) AS BIGINT) AS n_tokens
         FROM de GROUP BY doc_id"""
  }

  /** DuckDB replay of [[Dedup.Md5Hash]].lane(i, s): Kirsch–Mitzenmacher
    * double hashing over one md5 digest — h1 + i·(h2 mod 2⁵⁵), where h1/h2
    * are 60-bit BIGINTs from hex chars 1–15 / 17–31 (DuckDB CASTs '0x…'
    * strings directly). */
  private def laneSql(i: Int, s: String): String =
    s"(CAST('0x' || substring(md5($s), 1, 15) AS BIGINT)" +
      s" + $i * (CAST('0x' || substring(md5($s), 17, 15) AS BIGINT) % ${1L << 55}))"

  /** DuckDB replay of the sequential-fold cosine (Ann.cosine /
    * VecDotFloat): same left-to-right accumulation → bit-identical
    * doubles, proven by the passing ann_topk / emb_near_dup oracles. */
  private def cosSql(a: String, b: String): String =
    s"(list_reduce(list_transform(list_zip($a, $b), z -> CAST(z[1] AS DOUBLE)*CAST(z[2] AS DOUBLE)), (x,y) -> x+y)" +
      s" / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))" +
      s" * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))))"

  /** Replays Dedup.minHashLsh(n=3, bands=4, rowsPerBand=4, threshold=0.5,
    * maxBucket=100, family=Md5Hash): per-doc shingle lists, 16 md5 lanes,
    * banding, the bucket-size cap, then exact-Jaccard verification of the
    * candidates (the same index shape as the ngramJaccard oracle). */
  /** Replays Decontam.bloomDecontam(n=5, mBits=2^18, kHashes=3, bench =
    * doc_id % 50 == 0, family=Md5Hash): distinct 5-grams and the same 3
    * Kirsch–Mitzenmacher md5 lane positions per gram. The Spark side's
    * packed-word test `(bits[pos DIV 64] & mask(pos)) = mask(pos)` is by
    * construction equivalent to `pos ∈ {set positions}`, so the replay
    * joins the distinct position set directly — identical verdicts, false
    * positives included, without DuckDB's checked `<< 63` overflow. */
  private lazy val bloomDecontamOracle: String = {
    val m = 1 << 18
    def pos(i: Int) = s"(${laneSql(i, "shingle")} % $m)"
    val hit = (0 until 3).map(i => s"b$i.pos IS NOT NULL").mkString(" AND ")
    val joins = (0 until 3).map(i =>
      s"LEFT JOIN bpos b$i ON pe.p$i = b$i.pos").mkString("\n              ")
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                   FROM documents),
        g AS (SELECT doc_id, list_distinct(list_transform(range(0, len(ws)-4),
                       i -> array_to_string(ws[CAST(i AS BIGINT)+1 : CAST(i AS BIGINT)+5], ' '))) AS grams
              FROM w WHERE len(ws) >= 5),
        e AS (SELECT doc_id, unnest(grams) AS shingle FROM g),
        b AS (SELECT DISTINCT shingle FROM e WHERE doc_id % 50 = 0),
        bpos AS (SELECT DISTINCT unnest([${pos(0)}, ${pos(1)}, ${pos(2)}]) AS pos FROM b),
        pe AS (SELECT doc_id, ${pos(0)} AS p0, ${pos(1)} AS p1, ${pos(2)} AS p2
               FROM e),
        h AS (SELECT pe.doc_id, ($hit) AS hit
              FROM pe $joins)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS flag_frac
        FROM h GROUP BY doc_id"""
  }

  /** Replays Sketches.cmsCounts(width=4096, depth=3, family=Md5Hash) over
    * all bigram occurrences, probing the bench slice's distinct bigrams:
    * identical lane bucket indexes in both engines → identical counter
    * cells → identical min-estimates, collisions included. */
  private lazy val cmsOracle: String = {
    val wth = 4096
    def b(i: Int, s: String) = s"(${laneSql(i, s)} % $wth)"
    s"""WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> length(x)>0) AS ws
                   FROM documents),
        bg AS (SELECT doc_id, ws[CAST(i AS BIGINT)+1] || ' ' || ws[CAST(i AS BIGINT)+2] AS gram
               FROM w, unnest(range(0, len(ws)-1)) AS t(i)
               WHERE len(ws) >= 2),
        lanes AS (SELECT 0 AS d, ${b(0, "gram")} AS bk FROM bg
                  UNION ALL SELECT 1, ${b(1, "gram")} FROM bg
                  UNION ALL SELECT 2, ${b(2, "gram")} FROM bg),
        sk AS (SELECT d, bk, CAST(count(*) AS BIGINT) AS c FROM lanes GROUP BY d, bk),
        p AS (SELECT DISTINCT gram FROM bg WHERE doc_id % 50 = 0),
        pb AS (SELECT gram, ${b(0, "gram")} AS b0, ${b(1, "gram")} AS b1,
                      ${b(2, "gram")} AS b2 FROM p)
        SELECT pb.gram AS item,
               LEAST(COALESCE(s0.c, 0), COALESCE(s1.c, 0), COALESCE(s2.c, 0)) AS est_count
        FROM pb LEFT JOIN sk s0 ON s0.d = 0 AND s0.bk = pb.b0
                LEFT JOIN sk s1 ON s1.d = 1 AND s1.bk = pb.b1
                LEFT JOIN sk s2 ON s2.d = 2 AND s2.bk = pb.b2"""
  }

  /** Replays Sketches.heavyHitters(width=512, depth=3, φ=1/200,
    * Md5Hash) over the word stream: same lanes/buckets as [[cmsOracle]],
    * integer-multiplied φ compares. */
  private lazy val heavyHittersOracle: String = {
    def b(i: Int, s: String) = s"(${laneSql(i, s)} % 512)"
    s"""WITH wr AS (SELECT unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS item
                    FROM documents),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wr),
        lanes AS (SELECT 0 AS d, ${b(0, "item")} AS bk FROM wr
                  UNION ALL SELECT 1, ${b(1, "item")} FROM wr
                  UNION ALL SELECT 2, ${b(2, "item")} FROM wr),
        sk AS (SELECT d, bk, CAST(count(*) AS BIGINT) AS c FROM lanes GROUP BY d, bk),
        di AS (SELECT DISTINCT item FROM wr),
        pb AS (SELECT item, ${b(0, "item")} AS b0, ${b(1, "item")} AS b1,
                      ${b(2, "item")} AS b2 FROM di),
        est AS (SELECT pb.item,
                  LEAST(COALESCE(s0.c, 0), COALESCE(s1.c, 0), COALESCE(s2.c, 0)) AS est_count
                FROM pb LEFT JOIN sk s0 ON s0.d = 0 AND s0.bk = pb.b0
                        LEFT JOIN sk s1 ON s1.d = 1 AND s1.bk = pb.b1
                        LEFT JOIN sk s2 ON s2.d = 2 AND s2.bk = pb.b2),
        ex AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count FROM wr GROUP BY item)
        SELECT e.item, e.est_count, x.exact_count,
               (x.exact_count * 200 >= nn.n) AS exact_heavy
        FROM est e JOIN ex x ON e.item = x.item CROSS JOIN nn
        WHERE e.est_count * 200 >= nn.n"""
  }

  private lazy val minHashPairCtes: String = minHashPairCtesFor("TRUE")

  /** `docPred` restricts the corpus in play — the tombstone-deletion
    * replay for the LSH index lanes (an index whose deleted docs are
    * anti-joined out behaves EXACTLY like one built without them,
    * bucket-size caps included, because the tombstone filter runs before
    * membership counting). */
  private def minHashPairCtesFor(docPred: String,
                                 textExpr: String = "text"): String = {
    val bands = 4; val rpb = 4; val k = bands * rpb
    val sigCols = (0 until k).map(i =>
      s"list_min(list_transform(shs, s -> ${laneSql(i, "s")})) AS sig_$i").mkString(",\n                ")
    val bandSelects = (0 until bands).map { b =>
      val cols = (b * rpb until (b + 1) * rpb).map(i => s"sig_$i").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS bucket FROM sigs"
    }.mkString("\n                UNION ALL ")
    s"""WITH w AS (SELECT doc_id, list_filter(string_split($textExpr,' '), x -> length(x)>0) AS ws
                   FROM documents WHERE ($docPred)),
        sh AS (SELECT doc_id,
                 list_transform(range(0, len(ws)-2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]) AS shs
               FROM w WHERE len(ws) >= 3),
        sigs AS (SELECT doc_id,
                $sigCols
                FROM sh),
        bk AS ($bandSelects),
        ok AS (SELECT band, bucket FROM bk GROUP BY band, bucket
               HAVING COUNT(*) BETWEEN 2 AND 100),
        cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                 FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
                                     AND a.doc_id < b.doc_id
                 JOIN ok ON ok.band = a.band AND ok.bucket = a.bucket),
        g AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh2
              FROM w, unnest(range(1, len(ws)-1)) AS t(i) WHERE len(ws) >= 3),
        gc AS (SELECT g.* FROM g JOIN (SELECT doc_a AS d FROM cand
                                       UNION SELECT doc_b FROM cand) cd ON g.doc_id = cd.d),
        sz AS (SELECT doc_id, COUNT(*) AS c FROM gc GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
                  FROM gc a JOIN gc b ON a.sh2 = b.sh2 AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        vp AS (SELECT doc_a, doc_b, jaccard FROM (
                 SELECT c.doc_a, c.doc_b,
                        ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
                              / CAST(sa.c + sb.c - COALESCE(i.inter, 0) AS DOUBLE), 6) AS jaccard
                 FROM cand c LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
                 JOIN sz sa ON c.doc_a = sa.doc_id JOIN sz sb ON c.doc_b = sb.doc_id)
               WHERE jaccard >= 0.5)"""
  }

  private lazy val minHashLshOracle: String =
    s"$minHashPairCtes SELECT doc_a, doc_b, jaccard FROM vp"

  /** Replays Dedup.buildLshIndex(old = doc_id%5<>4) +
    * dedupAgainstIndex(new = doc_id%5==4): the incremental verdicts equal
    * the MONOLITHIC pair computation restricted to pairs touching the
    * batch — a new doc drops when a verified partner is existing (either
    * direction) or a smaller-id new doc (pairs are a<b, so every
    * doc_b-side pair counts; a doc_a-side pair counts only when the
    * larger partner is existing). */
  private lazy val dedupIncrementalOracle: String =
    s"""$minHashPairCtes,
        nd AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 4),
        pc AS (SELECT doc_id,
                 (SELECT COUNT(*) FROM vp WHERE vp.doc_b = nd.doc_id)
               + (SELECT COUNT(*) FROM vp
                  WHERE vp.doc_a = nd.doc_id AND vp.doc_b % 5 <> 4) AS n_dup_partners
               FROM nd)
        SELECT doc_id, n_dup_partners > 0 AS is_dup,
               CAST(n_dup_partners AS BIGINT) AS n_dup_partners
        FROM pc"""

  /** Update twin of [[dedupIncrementalOracle]]: the %10==3 docs were
    * re-ingested with edited text (tombstone → compact → re-sign +
    * append), so the monolithic replay runs over the MODIFIED corpus —
    * the same marker-word edit applied in SQL. Same partner-count rule. */
  private lazy val dedupLshUpdateOracle: String =
    s"""${minHashPairCtesFor("TRUE",
        "CASE WHEN doc_id % 10 = 3 THEN array_to_string(" +
          "list_transform(list_filter(string_split(text, ' '), " +
          "x -> length(x) > 0), w -> w || '~u'), ' ') ELSE text END")},
        nd AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 4),
        pc AS (SELECT doc_id,
                 (SELECT COUNT(*) FROM vp WHERE vp.doc_b = nd.doc_id)
               + (SELECT COUNT(*) FROM vp
                  WHERE vp.doc_a = nd.doc_id AND vp.doc_b % 5 <> 4) AS n_dup_partners
               FROM nd)
        SELECT doc_id, n_dup_partners > 0 AS is_dup,
               CAST(n_dup_partners AS BIGINT) AS n_dup_partners
        FROM pc"""

  /** Delete twin of [[dedupIncrementalOracle]]: the index over doc_id%5≠4
    * loses its doc_id%10=3 members to tombstones (all of which ARE indexed
    * — %10=3 ⊂ %5≠4), so verdicts must equal the monolithic pair run over
    * the corpus WITHOUT them. Same partner-count rule. */
  private lazy val dedupLshDeleteOracle: String =
    s"""${minHashPairCtesFor("doc_id % 10 <> 3")},
        nd AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 4),
        pc AS (SELECT doc_id,
                 (SELECT COUNT(*) FROM vp WHERE vp.doc_b = nd.doc_id)
               + (SELECT COUNT(*) FROM vp
                  WHERE vp.doc_a = nd.doc_id AND vp.doc_b % 5 <> 4) AS n_dup_partners
               FROM nd)
        SELECT doc_id, n_dup_partners > 0 AS is_dup,
               CAST(n_dup_partners AS BIGINT) AS n_dup_partners
        FROM pc"""

  /** Replays [[graft.ann.Quant.binaryTopK]](k=5, dIn=64): the same packed
    * 32-bit sign words (bit weights inlined as positive literals — the
    * SimHash precedent), Hamming via bit_count(xor), id ties. */
  private lazy val annHammingOracle: String = {
    def word(w: Int): String = (0 until 32).map(j =>
      s"CASE WHEN dv[${w * 32 + j + 1}] > 0.0 THEN ${1L << j} ELSE 0 END")
      .mkString("\n                    + ")
    s"""WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
                   FROM embeddings),
       p AS (SELECT vec_id,
                    CAST(${word(0)} AS BIGINT) AS w0,
                    CAST(${word(1)} AS BIGINT) AS w1
             FROM d),
       q AS (SELECT vec_id AS query_id, w0 AS q0, w1 AS q1 FROM p WHERE vec_id < 10),
       sc AS (SELECT query_id, vec_id AS neighbor_id,
                     CAST(bit_count(xor(q0, w0)) + bit_count(xor(q1, w1)) AS BIGINT) AS hamming
              FROM p JOIN q ON query_id <> vec_id)
       SELECT query_id, neighbor_id, rank, hamming FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY hamming ASC, neighbor_id ASC) AS rank
         FROM sc)
       WHERE rank <= 5"""
  }

  /** Replays Dedup.simHashPairs(maxHamming=6, family=Md5Hash,
    * maxBucket=1000): 32 weighted bit sums per doc, high-16-bit banding
    * with the bucket-size cap, Hamming verify via bit_count(xor). */
  private lazy val simHashOracle: String = {
    val bitSums = (0 until 32).map(i =>
      s"SUM(CASE WHEN (h // ${1L << i}) % 2 = 1 THEN cnt ELSE -cnt END) AS b_$i")
      .mkString(",\n                ")
    val sig = (0 until 32).map(i =>
      s"CASE WHEN b_$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString("\n                + ")
    s"""WITH wr AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> length(x)>0)) AS w
                    FROM documents),
        wc AS (SELECT doc_id, w, COUNT(*) AS cnt FROM wr GROUP BY doc_id, w),
        h AS (SELECT doc_id, ${laneSql(0, "w")} AS h, cnt FROM wc),
        bits AS (SELECT doc_id,
                $bitSums
                FROM h GROUP BY doc_id),
        sig AS (SELECT doc_id,
                $sig AS simhash
                FROM bits),
        bd AS (SELECT doc_id, simhash, simhash // 65536 AS band FROM sig),
        ok AS (SELECT band FROM bd GROUP BY band HAVING COUNT(*) BETWEEN 2 AND 1000)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM bd a JOIN bd b ON a.band = b.band AND a.doc_id < b.doc_id
        JOIN ok ON ok.band = a.band
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 6"""
  }

  /** DuckDB replay of [[graft.ann.Ann.lshSignature]]: the hyperplane
    * coefficient matrix is generated by the SAME Scala code
    * ([[graft.ann.Ann.hyperplanes]]) and inlined as literal lists (%.17g
    * round-trips doubles exactly); the sign fold then replays bit-for-bit. */
  private def lshSigSql(bits: Int, dims: Int, seed: Long, vecExpr: String): String = {
    val hp = graft.ann.Ann.hyperplanes(seed, bits, dims)
    def planeList(i: Int): String =
      hp(i).map(c => f"$c%.17g").mkString("[", ", ", "]")
    (0 until bits).map { i =>
      s"""CASE WHEN list_reduce(list_transform(list_zip($vecExpr, ${planeList(i)}),
             z -> CAST(z[1] AS DOUBLE) * z[2]), (x, y) -> x + y) > 0
          THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"""
    }.mkString("\n                + ")
  }

  /** Replays Ann.lshTopK(k=3, dims=64, bits=8, seed=42). */
  private lazy val annLshOracle: String = {
    val sigTerms = lshSigSql(8, 64, 42L, "embedding")
    s"""WITH sig AS (SELECT vec_id, embedding,
                $sigTerms AS bucket
              FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM sig WHERE vec_id < 20),
        scored AS (SELECT q.query_id, s.vec_id AS neighbor_id,
                     ROUND(${cosSql("q.qv", "s.embedding")}, 6) AS cos
                   FROM q JOIN sig s USING (bucket)
                   WHERE q.query_id <> s.vec_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
        WHERE rank <= 3"""
  }

  /** Replays Ann.lshNearDupPairs(dims=64, bits=6, threshold=0.3,
    * maxBucket=1000, seed=42): seeded-signature blocks, bucket-size cap,
    * capped self-join, cosine verify. */
  private lazy val embLshOracle: String = {
    val sigTerms = lshSigSql(6, 64, 42L, "embedding")
    s"""WITH sig AS (SELECT vec_id, embedding,
                $sigTerms AS blk
              FROM embeddings),
        ok AS (SELECT blk FROM sig GROUP BY blk
               HAVING COUNT(*) BETWEEN 2 AND 1000)
        SELECT vec_a, vec_b, cos FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ROUND(${cosSql("a.embedding", "b.embedding")}, 6) AS cos
          FROM sig a JOIN sig b USING (blk) JOIN ok USING (blk)
          WHERE a.vec_id < b.vec_id)
        WHERE cos >= 0.3"""
  }

  /** Replays Ann.ivfTopK(k=5, nLists=16, nProbe=4, lloydIters=0): the
    * value-predicate seed centroids, broadcast-argmin assignment
    * (ROW_NUMBER), nProbe probing, exact re-rank. Unrounded cosines order
    * identically in both engines because the fold is bit-identical. */
  /** Replays Ann.ivfTopK(k=5, nLists=16, nProbe=4, lloydIters=1,
    * foldCentroids=true): seed centroids and first assignment as in
    * [[ivf0Oracle]], then ONE Lloyd update where each centroid element is
    * the sequential-fold SUM of its cell's values in cid order (not the
    * mean — cosine is scale-invariant, so sum ≡ mean for every ranking,
    * and `list_reduce` over `list(x ORDER BY cid)` replays Spark's
    * `aggregate(array_sort(collect_list(struct(cid, x))))` bit-for-bit),
    * re-assignment + probing against the refined double centroids, exact
    * re-rank. */
  private lazy val ivf1Oracle: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM c),
        cent0 AS (SELECT cid AS centroid_id, cv AS centroid FROM c, par
                  WHERE cid % stride = 0 AND cid < stride * 16),
        assign0 AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent0.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent0.centroid")} ASC, cent0.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent0) WHERE rn = 1),
        cells0 AS (SELECT a.centroid_id, c.cid, c.cv FROM assign0 a JOIN c ON a.cid = c.cid),
        pts AS (SELECT centroid_id, cid, i AS pos, CAST(cv[i] AS DOUBLE) AS x
                FROM cells0, unnest(range(1, len(cv) + 1)) AS t(i)),
        m1 AS (SELECT centroid_id, pos,
                 list_reduce([CAST(0.0 AS DOUBLE)] || list(x ORDER BY cid), (a, b) -> a + b) AS m
               FROM pts GROUP BY centroid_id, pos),
        cent AS (SELECT centroid_id, list(m ORDER BY pos) AS centroid
                 FROM m1 GROUP BY centroid_id),
        assign AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        cells AS (SELECT a.centroid_id, c.cid, c.cv FROM assign a JOIN c ON a.cid = c.cid),
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        probes AS (SELECT query_id, qv, centroid_id FROM (
            SELECT q.query_id, q.qv, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr <= 4),
        scored AS (SELECT p.query_id, cells.cid AS neighbor_id,
                          ROUND(${cosSql("p.qv", "cells.cv")}, 6) AS cos
                   FROM probes p JOIN cells ON p.centroid_id = cells.centroid_id
                   WHERE p.query_id <> cells.cid)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM scored)
        WHERE rank <= 5"""

  /** Replays GraphAnn.graphTopK(k=5, nLists=16, degree=12, beam=16,
    * hops=5): ivf0-style seed centroids, top-2 cell assignment, per-cell
    * distinct pair scores → per-src top-12 edges, primary-assignment
    * medoids, then the 5 beam rounds unrolled as CTEs (candidates = beam ∪
    * out-neighbors, self excluded, exact round(6) re-score, top-16 by
    * (cos DESC, id ASC)). */
  /** The shared 5-round beam CTE block (b0 must exist; `edges` is the
    * adjacency CTE name; `c` carries (cid, cv); `q` the queries). */
  private def graphBeamHops(nHops: Int): String =
    (1 to nHops).map { i =>
      val prev = s"b${i - 1}"
      s"""cand$i AS (SELECT DISTINCT query_id, node FROM (
             SELECT query_id, node FROM $prev
             UNION ALL
             SELECT $prev.query_id, e.dst AS node
             FROM $prev JOIN edges e ON $prev.node = e.src)),
          s$i AS (SELECT cand$i.query_id, cand$i.node,
                         ROUND(${cosSql("q.qv", "c.cv")}, 6) AS cos
                  FROM cand$i JOIN c ON cand$i.node = c.cid
                       JOIN q ON cand$i.query_id = q.query_id
                  WHERE cand$i.query_id <> cand$i.node),
          b$i AS (SELECT query_id, node FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, node ASC) AS rn FROM s$i)
                  WHERE rn <= 16)"""
    }.mkString(",\n")

  private lazy val graphAnnOracle: String = {
    val hops = graphBeamHops(5)
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM c),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM c, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        a2 AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn <= 2),
        mem AS (SELECT a2.centroid_id, c.cid, c.cv FROM a2 JOIN c ON a2.cid = c.cid),
        prs AS (SELECT DISTINCT s.cid AS src, d.cid AS dst,
                       ROUND(${cosSql("s.cv", "d.cv")}, 6) AS score
                FROM mem s JOIN mem d
                  ON s.centroid_id = d.centroid_id AND s.cid <> d.cid),
        edges AS (SELECT src, dst FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY src
              ORDER BY score DESC, dst ASC) AS rn FROM prs) WHERE rn <= 12),
        a1 AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        med AS (SELECT centroid_id, cid AS entry FROM (
            SELECT a1.centroid_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY a1.centroid_id
                     ORDER BY ROUND(${cosSql("c.cv", "cent.centroid")}, 6) DESC, c.cid ASC) AS rn
            FROM a1 JOIN c ON a1.cid = c.cid
                 JOIN cent ON a1.centroid_id = cent.centroid_id) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qc AS (SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr = 1),
        b0 AS (SELECT qc.query_id, med.entry AS node FROM qc JOIN med USING (centroid_id)),
        $hops,
        fin AS (SELECT b5.query_id, b5.node AS neighbor_id,
                       ROUND(${cosSql("q.qv", "c.cv")}, 6) AS cos
                FROM b5 JOIN c ON b5.node = c.cid
                     JOIN q ON b5.query_id = q.query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5"""
  }

  /** Replays GraphAnn.cachedAppendedIndex(old = cid%5<>4) + topKFromIndex:
    * centroids/medoids frozen from the OLD subset (stride from the OLD
    * count), old→old edges built among old members only, each NEW node's
    * top-12 edges ranked within its 2 cells over the FULL population and
    * appended bidirectionally, then the shared 5-round beam block over the
    * union adjacency. */
  private lazy val graphAnnAppendOracle: String = {
    val hops = graphBeamHops(5)
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        old AS (SELECT * FROM c WHERE cid % 5 <> 4),
        nw AS (SELECT * FROM c WHERE cid % 5 = 4),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM old),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM old, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        a2old AS (SELECT cid, centroid_id FROM (
            SELECT old.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY old.cid
                     ORDER BY -${cosSql("old.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM old CROSS JOIN cent) WHERE rn <= 2),
        memold AS (SELECT a2old.centroid_id, old.cid, old.cv
                   FROM a2old JOIN old ON a2old.cid = old.cid),
        prsold AS (SELECT DISTINCT s.cid AS src, d.cid AS dst,
                          ROUND(${cosSql("s.cv", "d.cv")}, 6) AS score
                   FROM memold s JOIN memold d
                     ON s.centroid_id = d.centroid_id AND s.cid <> d.cid),
        eold AS (SELECT src, dst FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY src
              ORDER BY score DESC, dst ASC) AS rn FROM prsold) WHERE rn <= 12),
        a2all AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn <= 2),
        memall AS (SELECT a2all.centroid_id, c.cid, c.cv
                   FROM a2all JOIN c ON a2all.cid = c.cid),
        memnew AS (SELECT a2all.centroid_id, nw.cid AS src, nw.cv AS sv
                   FROM a2all JOIN nw ON a2all.cid = nw.cid),
        prsnew AS (SELECT DISTINCT m.src, d.cid AS dst,
                          ROUND(${cosSql("m.sv", "d.cv")}, 6) AS score
                   FROM memnew m JOIN memall d
                     ON m.centroid_id = d.centroid_id AND m.src <> d.cid),
        enew AS (SELECT src, dst FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY src
              ORDER BY score DESC, dst ASC) AS rn FROM prsnew) WHERE rn <= 12),
        edges AS (SELECT src, dst FROM eold
                  UNION ALL SELECT src, dst FROM enew
                  UNION ALL SELECT dst AS src, src AS dst FROM enew),
        a1old AS (SELECT cid, centroid_id FROM (
            SELECT old.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY old.cid
                     ORDER BY -${cosSql("old.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM old CROSS JOIN cent) WHERE rn = 1),
        med AS (SELECT centroid_id, cid AS entry FROM (
            SELECT a1old.centroid_id, old.cid,
                   ROW_NUMBER() OVER (PARTITION BY a1old.centroid_id
                     ORDER BY ROUND(${cosSql("old.cv", "cent.centroid")}, 6) DESC, old.cid ASC) AS rn
            FROM a1old JOIN old ON a1old.cid = old.cid
                 JOIN cent ON a1old.centroid_id = cent.centroid_id) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        qc AS (SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr = 1),
        b0 AS (SELECT qc.query_id, med.entry AS node FROM qc JOIN med USING (centroid_id)),
        $hops,
        fin AS (SELECT b5.query_id, b5.node AS neighbor_id,
                       ROUND(${cosSql("q.qv", "c.cv")}, 6) AS cos
                FROM b5 JOIN c ON b5.node = c.cid
                     JOIN q ON b5.query_id = q.query_id)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5"""
  }

  /** Replays Ann.semanticDedup(nLists=16, threshold=0.5, maxCell=10000,
    * lloydIters=0): [[ivf0Oracle]]'s seed centroids + cell assignment, the
    * cell-size gate, within-cell lower-id near-dup pairs at ROUND(cos,6)
    * >= 0.5, then the keep verdict per vector. */
  private lazy val semDedupOracle: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM c),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM c, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        assign AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        okc AS (SELECT centroid_id FROM assign GROUP BY centroid_id
                HAVING COUNT(*) BETWEEN 2 AND 10000),
        v AS (SELECT a.centroid_id, c.cid, c.cv
              FROM assign a JOIN c ON a.cid = c.cid JOIN okc USING (centroid_id)),
        dropped AS (SELECT DISTINCT b.cid AS vec_id
                    FROM v a JOIN v b ON a.centroid_id = b.centroid_id AND a.cid < b.cid
                    WHERE ROUND(${cosSql("a.cv", "b.cv")}, 6) >= 0.5)
        SELECT vec_id, vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
        FROM embeddings"""

  private lazy val ivf0Oracle: String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM c),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM c, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        assign AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        cells AS (SELECT a.centroid_id, c.cid, c.cv FROM assign a JOIN c ON a.cid = c.cid),
        q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        probes AS (SELECT query_id, qv, centroid_id FROM (
            SELECT q.query_id, q.qv, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr <= 4),
        scored AS (SELECT p.query_id, cells.cid AS neighbor_id,
                          ROUND(${cosSql("p.qv", "cells.cv")}, 6) AS cos
                   FROM probes p JOIN cells ON p.centroid_id = cells.centroid_id
                   WHERE p.query_id <> cells.cid)
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM scored)
        WHERE rank <= 5"""

  /** Replays Pq.ivfPqTopK(k=5, nLists=16, nProbe=4, m=8, dsub=8, ksub=16,
    * lloydIters=0): [[ivf0Oracle]]'s seed centroids / cell assignment /
    * probes composed with [[pqOracle]]'s codebooks / encode / ADC — a
    * corpus row is scored for a query iff its cell is in the query's probe
    * set. Same fold discipline as both parents. */
  /** Replays raw-lane IVF-PQ with quantizers trained on the `trainPred`
    * subset of the corpus and EVERY corpus row assigned + encoded against
    * them. `trainPred = "TRUE"` is the plain build; a proper subset replays
    * [[graft.ann.Pq.appendToSavedIndex]] — old rows train, all rows encode
    * (encoding is a pure function of the frozen artifacts, so
    * append-then-serve ≡ train-on-old-encode-all). */
  private def ivfPqOracleTrained(trainPred: String,
                                 servePred: String = "TRUE"): String =
    ivfPqOracleTrainedTail(trainPred,
      """SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5""", servePred)

  /** `servePred` restricts which corpus rows are SERVABLE (references
    * `e.cid`) — the tombstone-deletion replay: quantizers still train on
    * `trainPred`'s mass, but deleted rows never reach scoring (the FAISS
    * remove_ids stance `Pq.deleteFromSavedIndex` implements). */
  private def ivfPqOracleTrainedTail(trainPred: String, tail: String,
                                     servePred: String = "TRUE",
                                     cvExpr: String = "embedding"): String =
    s"""WITH c AS (SELECT vec_id AS cid, $cvExpr AS cv FROM embeddings),
        tr AS (SELECT cid, cv FROM
                 (SELECT vec_id AS cid, embedding AS cv FROM embeddings)
               WHERE $trainPred),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM tr),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM tr, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        assign AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qv,
                     sqrt(list_reduce([CAST(0 AS DOUBLE)] ||
                       list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) AS qn
              FROM embeddings WHERE vec_id < 10),
        probes AS (SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr <= 4),
        seeds AS (SELECT CAST(cid // stride AS INT) AS code, cv FROM tr, par
                  WHERE cid % stride = 0 AND cid < stride * 16),
        cb AS (SELECT u.sub, seeds.code,
                      list_transform(cv[u.sub*8+1 : u.sub*8+8], x -> CAST(x AS DOUBLE)) AS word
               FROM seeds, unnest(range(0, 8)) AS u(sub)),
        cs AS (SELECT cid, u.sub, cv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM c, unnest(range(0, 8)) AS u(sub)),
        enc AS (SELECT cid, sub, code FROM (
            SELECT cs.cid, cs.sub, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY cs.cid, cs.sub
                     ORDER BY list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(cs.sv, cb.word),
                           z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])),
                         (a, b) -> a + b) ASC, cb.code ASC) AS rn
            FROM cs JOIN cb USING (sub)) WHERE rn = 1),
        qs AS (SELECT query_id, qn, u.sub, qv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM q, unnest(range(0, 8)) AS u(sub)),
        adc AS (SELECT qs.query_id, qs.qn, qs.sub, cb.code,
                       list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(qs.sv, cb.word),
                           z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b) AS t,
                       list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(cb.word, w -> w * w), (a, b) -> a + b) AS nn
                FROM qs JOIN cb USING (sub)),
        elig AS (SELECT e.cid, e.sub, e.code, p.query_id
                 FROM enc e JOIN assign a ON e.cid = a.cid
                 JOIN probes p ON a.centroid_id = p.centroid_id
                 WHERE ($servePred)),
        agg AS (SELECT el.query_id, el.cid, min(a.qn) AS qn,
                       list_reduce([CAST(0 AS DOUBLE)] || list(a.t ORDER BY a.sub),
                         (x, y) -> x + y) AS sum_t,
                       list_reduce([CAST(0 AS DOUBLE)] || list(a.nn ORDER BY a.sub),
                         (x, y) -> x + y) AS sum_nn
                FROM elig el JOIN adc a ON el.query_id = a.query_id
                  AND el.sub = a.sub AND el.code = a.code
                WHERE el.query_id <> el.cid
                GROUP BY el.query_id, el.cid),
        fin AS (SELECT query_id, cid AS neighbor_id,
                       ROUND(sum_t / (qn * sqrt(sum_nn)), 6) AS score
                FROM agg)
        $tail"""

  private lazy val ivfPqOracle: String = ivfPqOracleTrained("TRUE")

  /** Recall@5 harness: the ADC top-5 (ivfPq tail) intersected with the
    * exact-cosine top-5 (ann_topk's self-excluding shape), per-query
    * integer match counts. */
  private lazy val annRecallOracle: String = ivfPqOracleTrainedTail("TRUE",
    s""", adc5 AS (SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, neighbor_id ASC) AS r
            FROM fin) WHERE r <= 5),
        q2 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        cc AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        bs AS (SELECT query_id, neighbor_id,
                 ROUND(${cosSql("qv", "cv")}, 6) AS cos
               FROM cc JOIN q2 ON query_id <> neighbor_id),
        bt AS (SELECT query_id, neighbor_id FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY cos DESC, neighbor_id ASC) AS r
               FROM bs) WHERE r <= 5),
        mt AS (SELECT adc5.query_id, COUNT(*) AS n
               FROM adc5 JOIN bt ON adc5.query_id = bt.query_id
                               AND adc5.neighbor_id = bt.neighbor_id
               GROUP BY 1)
        SELECT q2.query_id, CAST(COALESCE(mt.n, 0) AS BIGINT) AS n_match_at_5
        FROM q2 LEFT JOIN mt ON q2.query_id = mt.query_id""")

  /** nDCG@5 replay: the ADC top-5 graded against the exact top-5
    * (rel = 6 − exact_rank), discounts and IDCG interpolated from the
    * SAME Scala-computed doubles [[graft.ann.Ann.ndcgDiscounts]] embeds
    * in the operator (Double.toString round-trips), DCG as the ordered
    * list_reduce fold. */
  private lazy val annNdcgOracle: String = {
    // literal form matters: a bare decimal literal parses as DECIMAL in
    // DuckDB (decimal→double conversion is not correctly rounded — found
    // as a 1-ulp dcg drift); an exponent suffix forces a DOUBLE parse,
    // which round-trips Double.toString exactly
    def dlit(x: Double): String = {
      val s = java.lang.Double.toString(x)
      if (s.contains("E")) s else s + "e0"
    }
    val w = graft.ann.Ann.ndcgDiscounts(5)
    val idcg = dlit(graft.ann.Ann.idcgAt(5))
    val wList = w.map(dlit).mkString("[", ", ", "]")
    ivfPqOracleTrainedTail("TRUE",
      s""", adc5 AS (SELECT query_id, neighbor_id, r AS pos FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id ASC) AS r
              FROM fin) WHERE r <= 5),
          q2 AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
          cc AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
          bs AS (SELECT query_id, neighbor_id,
                   ROUND(${cosSql("qv", "cv")}, 6) AS cos
                 FROM cc JOIN q2 ON query_id <> neighbor_id),
          bt AS (SELECT query_id, neighbor_id, r AS exact_rank FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS r
                 FROM bs) WHERE r <= 5),
          gr AS (SELECT a.query_id, a.pos,
                        CAST(COALESCE(6 - b.exact_rank, 0) AS BIGINT) AS rel
                 FROM adc5 a LEFT JOIN bt b ON a.query_id = b.query_id
                                           AND a.neighbor_id = b.neighbor_id),
          per AS (SELECT query_id,
                    list(rel ORDER BY pos) AS rels,
                    list(pos ORDER BY pos) AS poss,
                    MIN(CASE WHEN rel > 0 THEN pos END) AS first_rel_pos,
                    CAST(COUNT(*) FILTER (WHERE rel > 0) AS BIGINT) AS n_rel
                  FROM gr GROUP BY query_id),
          mtr AS (SELECT query_id, n_rel, first_rel_pos,
                    list_reduce([CAST(0 AS DOUBLE)] ||
                      list_transform(list_zip(rels, poss),
                        p -> CAST(p[1] AS DOUBLE) * ($wList)[CAST(p[2] AS INT)]),
                      (a, b) -> a + b) AS dcg
                  FROM per)
          SELECT q2.query_id,
                 COALESCE(mtr.n_rel, 0) AS n_rel_at_5,
                 mtr.first_rel_pos,
                 COALESCE(mtr.dcg, 0.0) AS dcg5,
                 COALESCE(mtr.dcg, 0.0) / $idcg AS ndcg5
          FROM q2 LEFT JOIN mtr ON q2.query_id = mtr.query_id""")
  }

  /** ADC top-20 candidates (same tie rule as the serve path) re-ranked by
    * the exact sequential-fold cosine against raw embeddings. */
  private lazy val ivfPqRerankOracle: String = ivfPqOracleTrainedTail("TRUE",
    s""", cand AS (SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score DESC, neighbor_id ASC) AS r
            FROM fin) WHERE r <= 20),
        ex AS (SELECT cd.query_id, cd.neighbor_id,
                      ROUND(${cosSql("qe.embedding", "ne.embedding")}, 6) AS score
               FROM cand cd
               JOIN embeddings qe ON qe.vec_id = cd.query_id
               JOIN embeddings ne ON ne.vec_id = cd.neighbor_id)
        SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM ex)
        WHERE rank <= 5""")

  /** Replays Pq.ivfPqTopK(..., residual=true, lloydIters=0): residuals
    * rv = cv − centroid per assigned cell, the mid-stride-offset codebook
    * seeds (offset-0 seeds are the centroids themselves → all-zero
    * residual codebook), residual encode, and the decomposed cosine
    *   (q·c + Σ_s t) / (|q| · sqrt(|c|² + Σ_s e)),  e = 2·c_s·w + |w|²
    * with both cross-subspace sums as sequential folds in sub order. */
  private lazy val ivfPqResOracle: String = ivfPqResOracleTrained("TRUE")

  /** Residual-lane twin of [[ivfPqOracleTrained]]: quantizers (coarse
    * centroids + residual codebooks) train on the `trainPred` subset,
    * every corpus row is assigned + residual-encoded against them —
    * replaying residual [[graft.ann.Pq.appendToSavedIndex]]. Residuals of
    * training rows are identical whether derived from the subset or the
    * full corpus (same frozen centroids), so the seed rows coincide. */
  private def ivfPqResOracleTrained(trainPred: String): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings),
        tr AS (SELECT cid, cv FROM c WHERE $trainPred),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride,
                       GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) // 2 AS off
                FROM tr),
        cent AS (SELECT cid AS centroid_id, cv AS centroid FROM tr, par
                 WHERE cid % stride = 0 AND cid < stride * 16),
        assign AS (SELECT cid, centroid_id FROM (
            SELECT c.cid, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY c.cid
                     ORDER BY -${cosSql("c.cv", "cent.centroid")} ASC, cent.centroid_id ASC) AS rn
            FROM c CROSS JOIN cent) WHERE rn = 1),
        resid AS (SELECT c.cid, a.centroid_id,
                         list_transform(list_zip(c.cv, cent.centroid),
                           z -> CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) AS rv
                  FROM c JOIN assign a ON c.cid = a.cid
                  JOIN cent ON a.centroid_id = cent.centroid_id),
        seeds AS (SELECT CAST((cid - off) // stride AS INT) AS code, rv
                  FROM resid, par
                  WHERE cid >= off AND (cid - off) % stride = 0
                    AND cid < off + stride * 16 AND ($trainPred)),
        cb AS (SELECT u.sub, seeds.code,
                      rv[u.sub*8+1 : u.sub*8+8] AS word
               FROM seeds, unnest(range(0, 8)) AS u(sub)),
        cs AS (SELECT cid, u.sub, rv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM resid, unnest(range(0, 8)) AS u(sub)),
        enc AS (SELECT cid, sub, code FROM (
            SELECT cs.cid, cs.sub, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY cs.cid, cs.sub
                     ORDER BY list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(cs.sv, cb.word),
                           z -> (z[1] - z[2]) * (z[1] - z[2])),
                         (a, b) -> a + b) ASC, cb.code ASC) AS rn
            FROM cs JOIN cb USING (sub)) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, embedding AS qv,
                     sqrt(list_reduce([CAST(0 AS DOUBLE)] ||
                       list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) AS qn
              FROM embeddings WHERE vec_id < 10),
        probes AS (SELECT query_id, centroid_id FROM (
            SELECT q.query_id, cent.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY -${cosSql("q.qv", "cent.centroid")} ASC, cent.centroid_id ASC) AS pr
            FROM q CROSS JOIN cent) WHERE pr <= 4),
        qs AS (SELECT query_id, qn, u.sub, qv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM q, unnest(range(0, 8)) AS u(sub)),
        adc AS (SELECT qs.query_id, qs.qn, qs.sub, cb.code,
                       list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(qs.sv, cb.word),
                           z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b) AS t
                FROM qs JOIN cb USING (sub)),
        qcell AS (SELECT q.query_id, cent.centroid_id,
                         list_reduce([CAST(0 AS DOUBLE)] ||
                           list_transform(list_zip(q.qv, cent.centroid),
                             z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                           (a, b) -> a + b) AS qc,
                         list_reduce([CAST(0 AS DOUBLE)] ||
                           list_transform(cent.centroid,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                           (a, b) -> a + b) AS cn2
                  FROM q CROSS JOIN cent),
        centsub AS (SELECT centroid_id, u.sub,
                           centroid[u.sub*8+1 : u.sub*8+8] AS sv
                    FROM cent, unnest(range(0, 8)) AS u(sub)),
        ce AS (SELECT cs2.centroid_id, cs2.sub, cb.code,
                      2.0 * list_reduce([CAST(0 AS DOUBLE)] ||
                        list_transform(list_zip(cs2.sv, cb.word),
                          z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b)
                      + list_reduce([CAST(0 AS DOUBLE)] ||
                        list_transform(cb.word, w -> w * w), (a, b) -> a + b) AS e
               FROM centsub cs2 JOIN cb USING (sub)),
        elig AS (SELECT e.cid, e.sub, e.code, a.centroid_id, p.query_id
                 FROM enc e JOIN assign a ON e.cid = a.cid
                 JOIN probes p ON a.centroid_id = p.centroid_id),
        agg AS (SELECT el.query_id, el.cid, min(a.qn) AS qn,
                       min(qc.qc) AS qc, min(qc.cn2) AS cn2,
                       list_reduce([CAST(0 AS DOUBLE)] || list(a.t ORDER BY a.sub),
                         (x, y) -> x + y) AS sum_t,
                       list_reduce([CAST(0 AS DOUBLE)] || list(ce.e ORDER BY ce.sub),
                         (x, y) -> x + y) AS sum_e
                FROM elig el
                JOIN adc a ON el.query_id = a.query_id
                  AND el.sub = a.sub AND el.code = a.code
                JOIN ce ON el.centroid_id = ce.centroid_id
                  AND el.sub = ce.sub AND el.code = ce.code
                JOIN qcell qc ON el.query_id = qc.query_id
                  AND el.centroid_id = qc.centroid_id
                WHERE el.query_id <> el.cid
                GROUP BY el.query_id, el.cid),
        fin AS (SELECT query_id, cid AS neighbor_id,
                       ROUND((qc + sum_t) / (qn * sqrt(cn2 + sum_e)), 6) AS score
                FROM agg)
        SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5"""

  /** Replays Pq.pqTopK(k=5, m=8, dsub=8, ksub=16, lloydIters=0): the
    * value-predicate codebook seeds sliced per subspace, fold-L2 argmin
    * assignment with code-id tiebreak (ROW_NUMBER), the per-query ADC
    * table, and the two cross-subspace sums as sequential folds in sub
    * order. Every double op mirrors the Spark plan 1:1. */
  private lazy val pqOracle: String = pqOracleFrom("embedding")

  /** OPQ-lite replay: the SAME signed permutation the Spark op applies
    * (generated by [[graft.ann.Quant.signedPermutation]] and inlined as
    * literal list indices/negations), feeding the UNCHANGED PQ pipeline. */
  private lazy val opqOracle: String = {
    val (perm, signs) = graft.ann.Quant.signedPermutation(64)
    val rot = "[" + (0 until 64).map { j =>
      val e = s"embedding[${perm(j) + 1}]"
      if (signs(j) < 0) s"-$e" else e
    }.mkString(", ") + "]"
    pqOracleFrom(rot)
  }

  /** [[pqOracle]] parameterized by the embedding SOURCE expression (the
    * OPQ lane rotates it; the plain lane passes the column through). */
  private def pqOracleFrom(srcExpr: String): String =
    s"""WITH c AS (SELECT vec_id AS cid, $srcExpr AS cv FROM embeddings),
        par AS (SELECT GREATEST(CAST(1 AS BIGINT), COUNT(*) // 16) AS stride FROM c),
        seeds AS (SELECT CAST(cid // stride AS INT) AS code, cv FROM c, par
                  WHERE cid % stride = 0 AND cid < stride * 16),
        cb AS (SELECT u.sub, seeds.code,
                      list_transform(cv[u.sub*8+1 : u.sub*8+8], x -> CAST(x AS DOUBLE)) AS word
               FROM seeds, unnest(range(0, 8)) AS u(sub)),
        cs AS (SELECT cid, u.sub, cv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM c, unnest(range(0, 8)) AS u(sub)),
        enc AS (SELECT cid, sub, code FROM (
            SELECT cs.cid, cs.sub, cb.code,
                   ROW_NUMBER() OVER (PARTITION BY cs.cid, cs.sub
                     ORDER BY list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(cs.sv, cb.word),
                           z -> (CAST(z[1] AS DOUBLE) - z[2]) * (CAST(z[1] AS DOUBLE) - z[2])),
                         (a, b) -> a + b) ASC, cb.code ASC) AS rn
            FROM cs JOIN cb USING (sub)) WHERE rn = 1),
        q AS (SELECT vec_id AS query_id, $srcExpr AS qv,
                     sqrt(list_reduce([CAST(0 AS DOUBLE)] ||
                       list_transform($srcExpr, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) AS qn
              FROM embeddings WHERE vec_id < 10),
        qs AS (SELECT query_id, qn, u.sub, qv[u.sub*8+1 : u.sub*8+8] AS sv
               FROM q, unnest(range(0, 8)) AS u(sub)),
        adc AS (SELECT qs.query_id, qs.qn, qs.sub, cb.code,
                       list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(list_zip(qs.sv, cb.word),
                           z -> CAST(z[1] AS DOUBLE) * z[2]), (a, b) -> a + b) AS t,
                       list_reduce([CAST(0 AS DOUBLE)] ||
                         list_transform(cb.word, w -> w * w), (a, b) -> a + b) AS nn
                FROM qs JOIN cb USING (sub)),
        agg AS (SELECT a.query_id, e.cid, min(a.qn) AS qn,
                       list_reduce([CAST(0 AS DOUBLE)] || list(a.t ORDER BY a.sub),
                         (x, y) -> x + y) AS sum_t,
                       list_reduce([CAST(0 AS DOUBLE)] || list(a.nn ORDER BY a.sub),
                         (x, y) -> x + y) AS sum_nn
                FROM enc e JOIN adc a ON e.sub = a.sub AND e.code = a.code
                WHERE a.query_id <> e.cid
                GROUP BY a.query_id, e.cid),
        fin AS (SELECT query_id, cid AS neighbor_id,
                       ROUND(sum_t / (qn * sqrt(sum_nn)), 6) AS score
                FROM agg)
        SELECT query_id, neighbor_id, rank, score FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, neighbor_id ASC) AS BIGINT) AS rank
          FROM fin)
        WHERE rank <= 5"""
}
