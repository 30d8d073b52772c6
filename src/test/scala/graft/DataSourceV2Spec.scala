package graft

import org.apache.spark.sql.functions._

class DataSourceV2Spec extends SparkSpec {
  import spark.implicits._

  private def src = spark.read.format("graft.sources.v2.SyntheticMarketSource")
    .option("nSymbols", 20).option("nDays", 50).option("seed", 7)

  test("DSv2 source generates the full grid, deterministically") {
    val df = src.load()
    assert(df.count() == 20 * 50)
    val a = df.orderBy("symbol", "date").collect()
    val b = src.load().orderBy("symbol", "date").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("column pruning reaches the reader (ReadSchema shrinks)") {
    val df = src.load().select("close")
    val plan = df.queryExecution.executedPlan.toString()
    // DSv2 BatchScan prints the pruned output columns inline
    assert(plan.contains("synthetic_market[close#"),
      s"expected pruned BatchScan output in:\n$plan")
    assert(df.count() == 20 * 50)
  }

  test("symbol-equality pushdown plans a single symbol's partition") {
    val df = src.load().filter(col("symbol") === "000004.SZ")
    assert(df.count() == 50)
    assert(df.select("symbol").distinct().as[String].collect().toSeq == Seq("000004.SZ"))
    // unknown symbol → empty without scanning
    assert(src.load().filter(col("symbol") === "999999.SS").count() == 0)
  }

  test("date-range pushdown bounds the generated days") {
    val df = src.load()
      .filter(col("date").between(lit("2020-01-10"), lit("2020-01-19")))
    assert(df.count() == 20 * 10)
    val dates = df.select(min("date"), max("date")).as[(String, String)].head()
    assert(dates == ("2020-01-10", "2020-01-19"))
  }

  test("repeated bounds on one column intersect (tighter bound wins)") {
    val df = src.load()
      .filter(col("date") >= lit("2020-01-05"))
      .filter(col("date") >= lit("2020-01-10"))
      .filter(col("date") <= lit("2020-01-20"))
      .filter(col("date") <= lit("2020-01-15"))
    val dates = df.select(min("date"), max("date")).as[(String, String)].head()
    assert(dates == (("2020-01-10", "2020-01-15")))
    // conflicting symbol equalities → provably empty
    assert(src.load().filter(col("symbol") === "000002.SZ")
      .filter(col("symbol") === "000004.SZ").count() == 0)
  }

  test("aggregate pushdown: COUNT/MIN/MAX absorbed into the scan, zero rows generated") {
    // global shape: the scan's output IS the aggregate columns
    val g = src.load()
      .filter(col("date").between(lit("2020-01-10"), lit("2020-01-19")))
      .agg(count(lit(1)).as("n"), min("date").as("lo"), max("date").as("hi"))
    val plan = g.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedAggregates") ||
      plan.contains("count_star") || plan.contains("COUNT"),
      s"expected the aggregate absorbed into the BatchScan:\n$plan")
    assert(g.as[(Long, String, String)].head() ==
      ((20L * 10, "2020-01-10", "2020-01-19")))
    // the scan emitted only PARTIAL-AGG rows (≤ one per partition), never
    // the 200 data rows — the zero-rows-generated proof
    val scanRows = g.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    assert(scanRows <= 8, s"scan must emit partial-agg rows only, got $scanRows")

    // grouped shape: one arithmetic row per symbol
    val per = src.load().groupBy("symbol")
      .agg(count(lit(1)).as("n"), max("date").as("hi"))
    assert(per.count() == 20)
    assert(per.filter(col("n") =!= 50L).count() == 0)
    // pushdown ≡ the unpushed Scala-side aggregation (equivalence check)
    val unpushed = src.load().select("symbol", "date")
      .groupBy("symbol").agg(count(lit(1)).as("n"), max("date").as("hi"))
    assert(per.exceptAll(unpushed).isEmpty && unpushed.exceptAll(per).isEmpty)

    // empty grid: pushed global COUNT(*) must still be 0, not NULL
    val empty = src.load().filter(col("symbol") === "999999.SS")
      .agg(count(lit(1)).as("n")).as[Long].head()
    assert(empty == 0L)

    // unsupported shape (SUM(close)) falls back to generating rows
    val fallback = src.load().agg(sum("close").as("s"))
    val fplan = fallback.queryExecution.executedPlan.toString()
    assert(!fplan.contains("PushedAggregates") || fplan.contains("PushedAggregates: []"),
      s"SUM(close) must NOT be claimed by the source:\n$fplan")
    assert(fallback.as[Double].head() > 0.0)
  }

  test("limit pushdown: readers stop early, result honors the limit") {
    val df = src.load().limit(7)
    assert(df.count() == 7)
    val collected = df.collect()
    assert(collected.length == 7)
    // per-partition cap: ≤ limit rows per partition across ≤ 8 partitions,
    // instead of the 1000-row grid
    val q = src.load().limit(7)
    q.collect()
    val scanRows = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
    assert(scanRows <= 7L * 8, s"limit must cap reader output, got $scanRows")
    // limit composes with pushed filters
    val f = src.load().filter(col("symbol") === "000004.SZ").limit(3)
    assert(f.count() == 3 &&
      f.select("symbol").distinct().as[String].head() == "000004.SZ")
  }

  test("DSv2 write path: two-phase commit, schema contract, lossless round trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_sink").toString
    val df = Seq(
      (1L, "plain", 1.5, true),
      (2L, "esc \"quotes\"\nand\ttabs\\", -0.25, false),
      (3L, null.asInstanceOf[String], 0.0, true)
    ).toDF("id", "s", "v", "flag")
    df.write.format("graft.sources.v2.JsonlSinkSource")
      .option("path", dir).mode("append").save()
    // commit protocol: visible parts + _SUCCESS + schema; no temps remain
    val files = new java.io.File(dir).list().toSeq
    assert(files.contains("_SUCCESS") && files.contains("_schema.json"))
    assert(!files.exists(_.startsWith("_temp_")), s"uncommitted temps: $files")
    // schema-as-contract read-back
    val schema = org.apache.spark.sql.types.DataType.fromJson(
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "_schema.json").toPath), "UTF-8"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    def readBack = spark.read.schema(schema).json(s"$dir/part-*.jsonl")
    assert(readBack.collect().toSet == df.collect().toSet,
      "round trip must be lossless incl. escapes and nulls")
    // a stray temp (a dead writer attempt) is invisible to readers
    java.nio.file.Files.write(new java.io.File(dir, "_temp_dead_0_99").toPath,
      "{\"id\":999}".getBytes("UTF-8"))
    assert(readBack.filter(col("id") === 999L).count() == 0)
    // a second append accumulates (unique job ids — no clobbering)
    Seq((10L, "second", 9.9, false)).toDF("id", "s", "v", "flag")
      .write.format("graft.sources.v2.JsonlSinkSource")
      .option("path", dir).mode("append").save()
    assert(readBack.count() == 4)
  }

  test("pushed-down rows agree with post-filter rows (source guarantees filters)") {
    val all = src.load().collect().toSet
    val viaPushdown = src.load().filter(col("symbol") === "000003.SS").collect().toSet
    val viaScala = all.filter(_.getString(0) == "000003.SS")
    assert(viaPushdown == viaScala)
  }

  test("reported partitioning: symbol-keyed aggregation plans with ZERO shuffles; results identical") {
    def shuffles(df: org.apache.spark.sql.DataFrame): Int =
      "\\bExchange\\b".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    val agg = (d: org.apache.spark.sql.DataFrame) =>
      d.groupBy("symbol").agg(count(lit(1)).as("n"),
        sum(col("volume")).as("v"))
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val keyed = agg(src.option("reportPartitioning", "true").load())
      val plain = agg(src.load())
      assert(shuffles(plain) >= 1, "baseline must shuffle on the group key")
      assert(shuffles(keyed) == 0,
        s"reported KeyGroupedPartitioning must satisfy the clustering:\n" +
          keyed.queryExecution.executedPlan)
      // the claim must also be TRUE: identical results both ways
      val a = keyed.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val b = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(a == b && a.size == 20)
      // pruning symbol away withdraws the claim rather than lying
      val pruned = src.option("reportPartitioning", "true").load()
        .select("close").agg(count(lit(1))).collect()
      assert(pruned.head.getLong(0) == 20L * 50)
      // storage-partitioned JOIN: two keyed scans co-join on symbol with
      // zero exchanges (the connector-native answer to bucketed tables)
      val left = agg(src.option("reportPartitioning", "true").load())
      val right = src.option("reportPartitioning", "true").load()
        .groupBy("symbol").agg(max(col("close")).as("mx"))
      val spj = left.join(right, "symbol")
      assert(shuffles(spj) == 0,
        s"storage-partitioned join must not exchange:\n" +
          spj.queryExecution.executedPlan)
      assert(spj.count() == 20L)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }

  // ------------------------------------------------------- micro-batch read

  private def streamSrc = spark.readStream
    .format("graft.sources.v2.SyntheticMarketSource")
    .option("nSymbols", 20).option("nDays", 50).option("seed", 7)

  test("micro-batch read: stream drains the grid in day-range batches, bit-identical to the batch scan") {
    // daysPerBatch = 7 over 50 days -> ceil(50/7) = 8 micro-batches whose
    // boundaries align with nothing; the union of the batches must be
    // EXACTLY the batch grid (any offset overlap/gap duplicates or drops
    // a day slice across every symbol)
    val q = streamSrc.option("daysPerBatch", 7).load()
      .writeStream.format("memory").queryName("dsv2_mb").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsv2_mb")
      .select("symbol", "date", "close", "volume").collect().toSet
    val want = src.load()
      .select("symbol", "date", "close", "volume").collect().toSet
    assert(got.size == 20 * 50, s"stream emitted ${got.size} rows")
    assert(got == want, "stream rows diverge from the batch scan")
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches == 8, s"expected 8 day-range micro-batches, saw $batches")
  }

  test("micro-batch read: checkpointed stop/restart resumes from the day offset with no dup or loss") {
    // FILE sink (the memory sink refuses append-mode checkpoint recovery):
    // run 1 commits at least one 9-day batch under a slow trigger and is
    // STOPPED mid-grid; run 2 resumes from the SAME checkpoint with a fast
    // trigger and drains the rest. The sink's commit log makes the final
    // batch read the exactly-once view — total = grid exactly, values
    // bit-identical to the batch scan, across a real kill/resume.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dsv2_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft_dsv2_out").toString
    def start(trigger: Trigger) = streamSrc.option("daysPerBatch", 9).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append")
      .trigger(trigger).start()
    val q1 = start(Trigger.ProcessingTime("1 hour")) // batch 1 fires at start
    try {
      var waited = 0
      while (q1.recentProgress.isEmpty && waited < 600) {
        Thread.sleep(100); waited += 1
      }
    } finally q1.stop()
    val partial = spark.read.parquet(out).count()
    assert(partial > 0 && partial < 20 * 50,
      s"run 1 must stop strictly mid-grid, saw $partial rows")
    assert(partial % (20 * 9) == 0,
      s"run 1 must stop on a 9-day batch boundary (multiples of 180), saw $partial")
    val q2 = start(Trigger.ProcessingTime(0))
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(out)
      .select("symbol", "date", "close", "volume").collect()
    assert(all.length == 20 * 50,
      s"resume total ${all.length} after $partial — dup or loss across the checkpoint")
    val want = src.load()
      .select("symbol", "date", "close", "volume").collect().toSet
    assert(all.toSet == want, "resumed stream diverges from the batch scan")
  }

  test("micro-batch read: pushed symbol equality and date bounds prune the streamed grid") {
    val q = streamSrc.option("daysPerBatch", 6).load()
      .filter(col("symbol") === "000004.SZ")
      .filter(col("date").between(lit("2020-01-10"), lit("2020-01-19")))
      .writeStream.format("memory").queryName("dsv2_pruned").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("dsv2_pruned").select("symbol", "date")
      .as[(String, String)].collect()
    assert(rows.length == 10, s"pruned stream emitted ${rows.length} rows")
    assert(rows.forall(_._1 == "000004.SZ"))
    assert(rows.map(_._2).min == "2020-01-10" && rows.map(_._2).max == "2020-01-19")
  }

  test("streaming write: multi-epoch drain is exactly-once and lossless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Double)]
    val root = java.nio.file.Files.createTempDirectory("graft_v2ssink").toString
    val df = in.toDF().toDF("id", "name", "score")
    val q = df.writeStream.format("graft.sources.v2.JsonlSinkSource")
      .option("path", s"$root/out").option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    try {
      in.addData((1L, "a", 1.5)); q.processAllAvailable()   // epoch 0
      in.addData((2L, "b", -0.25), (3L, "c\n\"q", 2.0))     // epoch 1
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.schema(df.schema).json(s"$root/out")
      .as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "a", 1.5), (2L, "b", -0.25), (3L, "c\n\"q", 2.0)))
    // epoch markers recorded; parts named by epoch only (restart-stable)
    val files = new java.io.File(s"$root/out").listFiles().map(_.getName).toSet
    assert(files.exists(_.startsWith("_epoch_0")) && files.exists(_.startsWith("_epoch_1")))
    assert(files.filter(_.endsWith(".jsonl")).forall(_.startsWith("part-e")))
  }

  test("streaming write: replayed and partially-committed epochs converge (no dup, no loss)") {
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
    val confMap = graft.sources.v2.JsonlFs.sessionConfMap()
    val root = java.nio.file.Files.createTempDirectory("graft_v2replay").toString
    val path = s"$root/out"
    val w = new graft.sources.v2.JsonlStreamingWrite(path, schema, confMap)
    def temp(name: String, ids: Seq[Long],
             pid: Int): graft.sources.v2.JsonlCommit = {
      val dir = new java.io.File(path); dir.mkdirs()
      val f = new java.io.File(dir, name)
      val pw = new java.io.PrintWriter(f, "UTF-8")
      try ids.foreach(id => pw.println(s"""{"id":$id}""")) finally pw.close()
      graft.sources.v2.JsonlCommit(name, ids.size, pid)
    }
    // epoch 5 commits, then the SAME epoch replays with fresh temps (crash
    // between sink commit and checkpoint write): replay temps are dropped
    w.commit(5L, Array(temp("_temp_e5_0_1", Seq(1L, 2L), 0)))
    w.commit(5L, Array(temp("_temp_e5_0_2", Seq(1L, 2L), 0)))
    // epoch 6 PARTIALLY committed by a DEAD attempt with DIFFERENT splits
    // (ADVICE r15): its p0 landed with stale per-part content and its p1
    // landed as an orphan — the marker was never written. The replay
    // replans to ONE split carrying the epoch's full data; its part must
    // WIN the name collision and the orphan must be reconciled away.
    temp("_temp_e6_dead_p0", Seq(99L), 0)
    new java.io.File(path, "_temp_e6_dead_p0")
      .renameTo(new java.io.File(path, "part-e000006-p0.jsonl"))
    temp("_temp_e6_dead_p1", Seq(98L), 1)
    new java.io.File(path, "_temp_e6_dead_p1")
      .renameTo(new java.io.File(path, "part-e000006-p1.jsonl"))
    w.commit(6L, Array(temp("_temp_e6_0_9", Seq(7L), 0)))
    val back = spark.read.schema(schema).json(path)
      .select("id").as[Long].collect().sorted
    assert(back.toSeq == Seq(1L, 2L, 7L), s"converged table wrong: ${back.toSeq}")
    val leftoverTemps = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("_temp"))
    assert(leftoverTemps.isEmpty, s"temps not cleaned: ${leftoverTemps.toSeq}")
    // the epoch-6 manifest records exactly the surviving part set
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_epoch_6")), "UTF-8").split("\n").toSet
    assert(manifest == Set("part-e000006-p0.jsonl"),
      s"manifest wrong: $manifest")
  }
}
