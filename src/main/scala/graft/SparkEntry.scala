package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Joins, Windows}
import graft.sources.TestData

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator (or a tight group) from
  * SURVEY.md §2, expressed through the graft operator library over the
  * driver-provided parquet fixtures; `oracleSql` carries the DuckDB-equivalent
  * ANSI SQL for the driver's correctness gate.
  *
  * Determinism rules used throughout (so hash-compare with DuckDB is stable):
  *  - double SUMs go through decimal(25,6) (exact, order-independent) and are
  *    cast back to double;
  *  - every window order includes a unique tiebreaker column;
  *  - floating outputs are rounded where an engine-order-dependent path
  *    cannot be made exact.
  */
object SparkEntry {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(25,6)")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A2 counters + headline aggregation (TPC-H Q1 shape); decimal sums for
    // cross-engine exactness.
    "q1_pricing_summary" -> ((s, dir) => {
      val t = TestData(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dec(sum(dec(col("l_quantity")))).cast("double").as("sum_qty"),
          dec(sum(dec(col("l_extendedprice")))).cast("double").as("sum_base_price"),
          dec(sum(dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // F4 date-range predicate + P1 field-list projection (pushed to parquet).
    "f4_p1_range_scan" -> ((s, dir) => {
      val t = TestData(s, dir)
      t.lineitem
        .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1996-03-31")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),

    // J3 broadcast-map lookup join with default fill.
    "j3_broadcast_lookup" -> ((s, dir) => {
      val t = TestData(s, dir)
      val natReg = t.nation.join(broadcast(t.region),
        col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("n_nationkey"), col("n_name"), coalesce(col("r_name"), lit("UNKNOWN")).as("r_name"))
      Joins.broadcastLookup(
        t.customer.select(col("c_custkey"), col("c_nationkey")),
        natReg.withColumnRenamed("n_nationkey", "c_nationkey"),
        Seq("c_nationkey"), "n_name", lit("UNKNOWN"))
        .select("c_custkey", "n_name", "r_name")
    }),

    // W1 last-N-per-key (get_history(count) shape): last 3 orders/customer.
    "w1_last_n" -> ((s, dir) => {
      val t = TestData(s, dir)
      Windows.lastNPerKey(t.orders, Seq(col("o_custkey")),
          Seq(col("o_orderdate"), col("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    }),

    // A1/SET3 distinct-union accumulation of a key pool.
    "a1_distinct_union" -> ((s, dir) => {
      val t = TestData(s, dir)
      Aggregates.distinctUnion(Seq(
        t.orders.select(col("o_custkey").as("custkey")),
        t.customer.select(col("c_custkey").as("custkey"))))
    }),

    // J6 as-of join: for each purchase, the user's latest click at or before
    // the purchase timestamp (single-shuffle tagged-union plan).
    "j6_asof" -> ((s, dir) => {
      val t = TestData(s, dir)
      val purchases = t.events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts_ns"), col("value").as("purchase_value"))
      val clicks = t.events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_ns").as("cts"), col("value").as("click_value"))
      Joins.asOf(purchases, clicks, Seq("user_id"), "ts_ns", "cts", Seq("click_value"))
        .select("user_id", "event_id", "purchase_value", "click_value")
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_qty,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_base_price,
         CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "f4_p1_range_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-03-31 00:00:00'""",

    "j3_broadcast_lookup" ->
      """SELECT c_custkey,
                COALESCE(n_name, 'UNKNOWN') AS n_name,
                COALESCE(r_name, 'UNKNOWN') AS r_name
         FROM customer
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey""",

    "w1_last_n" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders) WHERE rn <= 3""",

    "a1_distinct_union" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
         UNION
         SELECT c_custkey AS custkey FROM customer""",

    "j6_asof" ->
      """WITH p AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn, value AS purchase_value
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT user_id, epoch_ns(ts) AS cts, value AS click_value
                    FROM events WHERE event_type = 'click')
         SELECT p.user_id, p.event_id, p.purchase_value, c.click_value
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tsn >= c.cts""",
  )
}
