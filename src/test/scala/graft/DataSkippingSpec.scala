package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Measured data-skipping evidence for the range-clustered layout: the
  * SAME selective predicate over the SAME rows reads a fraction of the
  * parquet row groups when files cover narrow key intervals, and the full
  * table when the layout is hash-scattered. The scan node's output-row
  * metric (rows surviving row-group pruning, before the residual filter)
  * is the measurement — not wall time, which local-mode noise owns.
  *
  * Keys are LONGs: Spark's parquet filter conversion silently drops
  * TIMESTAMP_NTZ predicates (they appear under `PushedFilters` but never
  * reach the reader, measured in round 10), so clustering on the engine's
  * `ts_ns`/integer keys is what actually skips — documented on
  * [[Sinks.writeRangeClustered]].
  */
class DataSkippingSpec extends SparkSpec {

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def expand(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case q: QueryStageExec => expand(q.plan)
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
    }.flatten
    val scans = expand(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no FileSourceScanExec found:\n" +
      df.queryExecution.executedPlan)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered layout skips row groups a hash-scattered layout reads") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val total = li.count()
    val root = java.nio.file.Files.createTempDirectory("graft_skip").toString
    // clustered: 8 files, each a narrow l_orderkey interval; scattered:
    // 8 files hash-partitioned on an uncorrelated column — every file
    // spans the full key range, so min/max stats prune nothing
    Sinks.writeRangeClustered(li, s"$root/clustered", Seq("l_orderkey"), numFiles = 8)
    li.repartition(8, col("l_suppkey"))
      .write.parquet(s"$root/scattered")
    val lowKeys = (c: DataFrame) => c.filter(col("l_orderkey") < 100)
    val clustered = lowKeys(spark.read.parquet(s"$root/clustered"))
    val scattered = lowKeys(spark.read.parquet(s"$root/scattered"))
    // correctness first: layout never changes the result
    val a = clustered.agg(count(lit(1)), sum("l_quantity")).head()
    val b = scattered.agg(count(lit(1)), sum("l_quantity")).head()
    assert(a == b, s"layouts disagree: $a vs $b")
    // the measured skip: scattered reads everything, clustered a fraction
    val cRows = scanRows(lowKeys(spark.read.parquet(s"$root/clustered")))
    val sRows = scanRows(lowKeys(spark.read.parquet(s"$root/scattered")))
    assert(sRows == total,
      s"scattered layout should read all $total rows, read $sRows")
    assert(cRows * 4 < sRows,
      s"clustering skipped nothing: clustered=$cRows scattered=$sRows")
  }

  test("z-order layout prunes on BOTH dims where 1-D clustering prunes on one") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val total = li.count()
    val root = java.nio.file.Files.createTempDirectory("graft_skip_z").toString
    Sinks.writeRangeClustered(li, s"$root/byorder", Seq("l_orderkey"), numFiles = 16)
    Sinks.writeZOrdered(li, s"$root/zorder", "l_orderkey", "l_partkey", numFiles = 16)
    val (hiO, hiP) = (li.agg(max("l_orderkey")).head().getLong(0),
      li.agg(max("l_partkey")).head().getLong(0))
    val predA = (d: DataFrame) => d.filter(col("l_orderkey") < hiO / 16)
    val predB = (d: DataFrame) => d.filter(col("l_partkey") < hiP / 16)
    def read(sub: String) = spark.read.parquet(s"$root/$sub")
    // correctness: layout never changes results, on either predicate
    for (p <- Seq(predA, predB)) {
      val a = p(read("byorder")).agg(count(lit(1)), sum("l_quantity")).head()
      val z = p(read("zorder")).agg(count(lit(1)), sum("l_quantity")).head()
      assert(a == z, s"layouts disagree: $a vs $z")
    }
    // 1-D layout: prunes hard on its sort key, reads EVERYTHING on the other
    val oA = scanRows(predA(read("byorder")))
    val oB = scanRows(predB(read("byorder")))
    assert(oA * 4 < total, s"1-D layout should prune its own key: $oA/$total")
    assert(oB == total, s"1-D layout can't prune the other key: $oB/$total")
    // z-order: meaningful pruning on BOTH dims (the multi-dim trade:
    // neither prunes as hard as a dedicated 1-D sort, both prune well)
    val zA = scanRows(predA(read("zorder")))
    val zB = scanRows(predB(read("zorder")))
    assert(zA * 2 < total, s"z-order should prune dim A: $zA/$total")
    assert(zB * 2 < total, s"z-order should prune dim B: $zB/$total")
    info(s"rows read of $total — 1-D: A=$oA B=$oB; z-order: A=$zA B=$zB")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact PARTITIONS at runtime") {
    // the 100 TB star-join layout: the fact is hive-partitioned on the
    // join key's granularity (here ship month) and the dim filter is only
    // known at runtime — DPP injects a dynamic pruning subquery into the
    // fact scan's PartitionFilters so unselected partitions are never
    // LISTED, let alone read (static pruning can't do this: the filter is
    // on the DIM, not the fact)
    val root = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    li.write.partitionBy("ship_month").parquet(s"$root/fact")
    val fact = spark.read.parquet(s"$root/fact")
    import spark.implicits._
    // the dim must be a STORED relation: a driver-local frame's filter
    // constant-folds into the LocalRelation and PartitionPruning then
    // sees no selective predicate to prune with (measured here)
    fact.select(col("ship_month")).distinct()
      .as[String].collect().sorted
      .map(m => (m, m.substring(5, 7).toInt)).toSeq
      .toDF("ship_month", "month_no")
      .write.parquet(s"$root/dim")
    val monthDim = spark.read.parquet(s"$root/dim")
    val q = fact
      .join(broadcast(monthDim.filter(col("month_no") === 3)), Seq("ship_month"))
      .agg(sum(col("l_quantity").cast("decimal(25,6)")).as("qty"))
    val got = q.collect().head.getDecimal(0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan must carry a dynamic pruning subquery:\n" + plan)
    // partition-level proof: the FACT scan read only the March partitions
    // (scanRows sums every file scan — the dim's rows must not count)
    val read = scanRows(q) - monthDim.count()
    val want = fact.filter(substring(col("ship_month"), 6, 2) === "03")
    assert(read == want.count(), s"DPP read $read fact rows, expected only March's")
    assert(got == want.agg(sum(col("l_quantity").cast("decimal(25,6)")))
      .collect().head.getDecimal(0))
  }

  test("runtime bloom-filter join pruning fires on a shuffle join with a selective build") {
    // DPP's complement for NON-partition columns: a selective dim filter
    // turns into a bloom filter evaluated on the fact side BEFORE the
    // join shuffle, so non-matching fact rows never cross the wire. The
    // application-side threshold defaults to 10 GB (it exists to protect
    // small scans from filter overhead) — probe-scaled to 0 here, the
    // SkewProbe precedent: the REAL default would simply never fire at
    // test SF, which proves nothing either way.
    val conf = spark.conf
    val savedApp = conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      val ord = spark.read.parquet(s"$sf0001/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "fact side must carry the runtime bloom filter:\n" + plan.take(2000))
      // semantics unchanged by the filter
      val want = li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey")).count()
      assert(q.collect().head.getLong(0) == want)
    } finally {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", savedApp)
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  test("TIMESTAMP_NTZ caveat holds: an NTZ range predicate prunes no row groups") {
    // the guard for the doc claim — if a Spark upgrade starts converting
    // NTZ predicates, this fails and the caveat (plus the ts_ns guidance)
    // should be revisited
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val total = li.count()
    val root = java.nio.file.Files.createTempDirectory("graft_skip_ntz").toString
    Sinks.writeRangeClustered(li, s"$root/bydate", Seq("l_shipdate"), numFiles = 8)
    val filtered = spark.read.parquet(s"$root/bydate")
      .filter(col("l_shipdate").between(lit("1996-01-01"), lit("1996-02-28")))
    assert(scanRows(filtered) == total,
      "NTZ predicates now reach the parquet reader — update writeRangeClustered docs")
  }
}
