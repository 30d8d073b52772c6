package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Sink layer (SURVEY.md §2.1 K1–K12, re-expressed for Spark).
  *
  * The reference writes one HDF5 group per symbol (h5_writer.py) because
  * PyTables has no partition pruning; the Spark-native layout is ONE table
  * per dataset, parquet, partitioned by a date-derived column — date-range
  * predicates prune partitions, and `sortWithinPartitions(symbol, date)`
  * gives run-length locality for per-symbol scans (SURVEY.md §4 physical
  * notes). Per-symbol files would be catastrophic at 100 TB (5e3–5e6 tiny
  * files per day); partition-by-date + bucket-by-symbol is the layout that
  * scales.
  */
object Sinks {

  /** K1/K7/K8-style sink: write a long table partitioned by month of `date`,
    * sorted within partitions for symbol locality. */
  def writePartitioned(df: DataFrame, path: String,
                       dateCol: String = "date", mode: SaveMode = SaveMode.Overwrite): Unit =
    df.withColumn("p_month", date_format(col(dateCol), "yyyy-MM"))
      .repartition(col("p_month"))
      .sortWithinPartitions("symbol", dateCol)
      .write.mode(mode)
      .partitionBy("p_month")
      .parquet(path)

  /** K5-style dimension sink (small, unpartitioned, typed). */
  def writeDim(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)

  /** Range-clustered layout: `repartitionByRange` + `sortWithinPartitions`
    * on the skipping keys, so every file (and every parquet row group
    * inside it) covers a NARROW key interval and the footer min/max stats
    * become selective — a pushed range predicate then skips whole row
    * groups at read time instead of scanning and discarding.
    *
    * This is the data-skipping half of the layout story (the bucketed sink
    * covers join co-location): at 100 TB, directory partitioning handles
    * the coarse axis (month) and range-clustering handles the fine axis
    * (date/symbol within a partition) — Z-ordering without the
    * interleaving, which one-dimensional range predicates don't need.
    * `DataSkippingSpec` measures the effect: the same selective filter
    * reads a fraction of the row groups vs a hash-scattered layout.
    *
    * `numFiles > 0` pins the file count (and so the per-file key span);
    * 0 lets AQE size the ranges. Range boundaries come from sampling the
    * keys — layout only, never correctness.
    *
    * CAVEAT (measured, round 10): cluster on LONG/INT/DATE keys, not
    * TIMESTAMP_NTZ — Spark's parquet filter conversion silently drops NTZ
    * predicates (the plan shows them under `PushedFilters`, the reader
    * never sees them, zero row groups skip). The engine's `ts_ns` long is
    * the right clustering key for event time; `DataSkippingSpec` pins
    * both the working skip and this caveat. */
  def writeRangeClustered(df: DataFrame, path: String, keys: Seq[String],
                          numFiles: Int = 0): Unit = {
    val ranged =
      if (numFiles > 0) df.repartitionByRange(numFiles, keys.map(col): _*)
      else df.repartitionByRange(keys.map(col): _*)
    ranged.sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-ordered (Morton-interleaved) data-skipping layout — the multi-dim
    * answer [[writeRangeClustered]]'s single sort key can't give: range
    * clustering on key A makes every file span the FULL range of key B,
    * so B-predicates prune nothing. Interleaving the bits of both keys'
    * range-buckets puts rows close in (A, B) space into the same files —
    * each file covers a narrow rectangle, and min/max row-group stats
    * prune on EITHER dimension (measured in `DataSkippingSpec`).
    *
    * Bucketing shifts `v − min` down until it fits `bits` bits (one tiny
    * agg for the bounds; layout-time driver work). Pure integer column
    * ops — shifts and masks, no division, no UDF, exact at any key
    * magnitude. The Morton code exists only during the write; files carry
    * the original schema. */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    require(bits >= 1 && bits <= 21, "interleaved code must fit a long")
    val b = df.agg(
      min(col(keyA).cast("long")), max(col(keyA).cast("long")),
      min(col(keyB).cast("long")), max(col(keyB).cast("long"))).head()
    val (loA, hiA, loB, hiB) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val steps = Seq( // magic-number bit spread (x -> x with 0s interleaved)
      (32, 0x00000000FFFFFFFFL), (16, 0x0000FFFF0000FFFFL),
      (8, 0x00FF00FF00FF00FFL), (4, 0x0F0F0F0F0F0F0F0FL),
      (2, 0x3333333333333333L), (1, 0x5555555555555555L))
    def spread(c: Column): Column =
      steps.foldLeft(c) { case (x, (sh, mask)) =>
        (x.bitwiseOR(shiftleft(x, sh))).bitwiseAND(lit(mask)) }
    // Normalize each key to EXACTLY `bits` effective bits — narrower keys
    // shift UP, wider ones DOWN. Equal widths matter: if one key carries
    // more significant bits than the other, the interleaved code's high
    // bits are dominated by that key and the curve degenerates to a 1-D
    // sort on it (measured: dim-B pruning vanished before this).
    def bucket(c: Column, lo: Long, hi: Long): Column = {
      val rangeBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(hi - lo, 1L))
      val d = c.cast("long") - lit(lo)
      if (rangeBits >= bits) shiftright(d, rangeBits - bits)
      else shiftleft(d, bits - rangeBits)
    }
    val z = spread(bucket(col(keyA), loA, hiA))
      .bitwiseOR(shiftleft(spread(bucket(col(keyB), loB, hiB)), 1))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** K11 catalog probe: symbols already present in a sink
    * (h5_writer.py:466-509 `get_existing_stocks`). Column-pruned scan —
    * only the `symbol` column is read. */
  def existingSymbols(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("symbol").distinct()

  /** K12 integrity check: path readable, schema contains the expected
    * columns, row count positive (check_file_integrity analogue). */
  def checkIntegrity(spark: SparkSession, path: String, requiredCols: Seq[String]): Boolean =
    try {
      val df = spark.read.parquet(path)
      requiredCols.forall(df.columns.contains) && df.limit(1).count() == 1
    } catch { case _: Throwable => false }

  /** J4-backed incremental refresh: merge `fresh` rows into the table at
    * `path` (last-wins on key), rewriting only the partitions that received
    * fresh data — the offline stand-in for Delta MERGE
    * (SURVEY.md §7.4.5). */
  def upsertPartitioned(spark: SparkSession, path: String, fresh: DataFrame,
                        keys: Seq[String], dateCol: String = "date"): Unit = {
    val touched = fresh.select(date_format(col(dateCol), "yyyy-MM").as("p_month"))
      .distinct().collect().map(_.getString(0))
    // filter on the PARTITION column so the read prunes to touched months;
    // a predicate on date_format(dateCol) cannot be mapped to partitions
    // and would list/scan the whole table
    val existing = spark.read.parquet(path)
      .filter(col("p_month").isin(touched.toSeq: _*))
      .drop("p_month")
    // Materialize the merge BEFORE the write plans: the write below
    // overwrites partitions of the very table `existing` reads from. With
    // dynamic partitionOverwriteMode the commit is staged-then-swapped, but
    // if that option were ever lost (or the session default forced static),
    // a lazy read inside the overwrite's plan would see deleted partitions
    // and destroy data. The checkpoint bounds the risk to touched months —
    // small by construction.
    val merged = Joins.upsert(
      existing.withColumn("__batch", lit(0)),
      fresh.select(existing.columns.toIndexedSeq.map(col): _*).withColumn("__batch", lit(1)),
      keys, Seq(col("__batch"))).drop("__batch")
      .localCheckpoint()
    merged.withColumn("p_month", date_format(col(dateCol), "yyyy-MM"))
      .repartition(col("p_month"))
      .sortWithinPartitions("symbol", dateCol)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("p_month")
      .parquet(path)
  }

  /** Bucketed fact sink: hash-bucket (and sort) by the join key so joins
    * and aggregations on that key are CO-LOCATED — the scan itself reports
    * the hash partitioning, and a join between two tables bucketed the
    * same way runs with ZERO shuffle exchanges (the 100 TB strategy
    * SCALE.md prescribes for repeated fact⋈fact joins; enforced by the
    * j10_bucketed_join plan freeze). `saveAsTable` is required — bucket
    * metadata lives in the catalog, not the parquet footer — with `path`
    * keeping the data external to any warehouse dir. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Small-files compaction — the standard companion to streaming file
    * sinks: micro-batches write a file per trigger per partition, and at
    * 100 TB the resulting listing/open overhead dominates scans long
    * before data volume does. Rewrites `path` into
    * ceil(totalBytes / targetBytes) files (size-proportional, so an
    * already-compact table is a near-no-op rewrite).
    *
    * Swap discipline: the compacted data is fully written to a staging
    * dir FIRST, then swapped in with two renames (old → trash, staged →
    * path) and the trash deleted last — the read plan never races its own
    * overwrite (the `upsertPartitioned` hazard), and a crash mid-swap
    * leaves a recoverable directory rather than a half-deleted table.
    * Returns the resulting file count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    // the table's own FileSystem — local, HDFS, or an object store; every
    // list/rename below goes through this API, so compaction works wherever
    // the sink wrote (the pre-r10 version walked java.io.File and silently
    // only worked on local disk)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val qRoot = fs.makeQualified(root)
    // RECURSIVE byte-summing: streaming sinks nest nothing, but a
    // partitioned layout keeps its data in p_*=... subdirs — those used to
    // sum to 0 bytes and collapse to one file. A flat rewrite would strip
    // the partition directories anyway, so nested data is rejected loudly:
    // compact each leaf partition directory instead.
    val it = fs.listFiles(qRoot, true)
    var total = 0L
    var nested = false
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        total += st.getLen
        if (st.getPath.getParent != qRoot) nested = true
      }
    }
    require(!nested,
      s"compact($path): data files below the root (a partitioned layout) — " +
        "a flat rewrite would destroy the partition dirs; compact each " +
        "leaf partition directory instead")
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staged = new Path(s"$path.__compacting")
    val trash = new Path(s"$path.__trash")
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staged.toString)
    require(fs.rename(qRoot, trash), s"compact($path): rename to trash failed")
    require(fs.rename(fs.makeQualified(staged), qRoot),
      s"compact($path): staged swap-in failed — original preserved at $trash")
    fs.delete(fs.makeQualified(trash), true)
    fs.listStatus(qRoot)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Partitioned-layout compaction: [[compact]] each LEAF partition
    * directory (`p_month=.../`) independently. This is the shape streaming
    * sinks + `partitionBy` actually produce, and per-leaf rewriting is the
    * 100 TB discipline anyway — only the partitions that accumulated small
    * files are touched (pass `leafFilter` to scope to recent months), each
    * leaf swap is independent, and a crash affects at most one partition.
    * Returns (leaf dir → resulting file count). */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long = 128L * 1024 * 1024,
                         leafFilter: String => Boolean = _ => true): Map[String, Int] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def leaves(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.startsWith("_")) // _spark_metadata etc.
      if (kids.isEmpty) Seq(p) else kids.toSeq.flatMap(leaves)
    }
    leaves(fs.makeQualified(root)).filterNot(_ == fs.makeQualified(root))
      .filter(p => leafFilter(p.getName))
      .map(leaf => leaf.toString -> compact(spark, leaf.toString, targetBytes))
      .toMap
  }

  // ------------------------------------------------------------ versioned table
  // Atomic multi-file publication — the minimal snapshot-isolation story a
  // parquet directory can't give by itself: a table rewrite touching many
  // files is visible either completely or not at all. Layout:
  //   root/v=<n>/...parquet      immutable snapshot directories
  //   root/_latest               ONE small file naming the live version
  // Writers stage a full new snapshot dir, then swap `_latest` via
  // write-temp + rename (rename is the atomic primitive on HDFS and posix;
  // object stores substitute a conditional put). Readers resolve `_latest`
  // ONCE and read an immutable dir — a concurrent publish can't tear their
  // scan, and old versions remain for time travel until vacuumed.

  /** Publish `df` as the next version of the table at `root`; returns the
    * new version number. The snapshot is fully written BEFORE the pointer
    * moves.
    *
    * CONCURRENT-WRITER CONTRACT (the Delta-log CAS shape, minimized):
    *  1. Version numbers are claimed via `fs.create(..., overwrite=false)`
    *     on a `v=N._claim` file — the one FS primitive that is atomic
    *     test-and-set on HDFS/posix (object stores substitute a
    *     conditional put). Exactly one racer wins each N; losers bump and
    *     retry, so two publishers can NEVER interleave files inside one
    *     snapshot directory (the check-then-write race `ErrorIfExists`
    *     alone would leave open).
    *  2. The `_latest` pointer advances MONOTONICALLY: each writer swaps
    *     only while the pointer is below its own version and re-reads
    *     after the swap, so racing swaps converge to max(version) — a
    *     slower v=5 writer can no longer overwrite the pointer of a
    *     faster v=6 writer (the r11 lost-update gap).
    *  3. Next-version discovery still lists the directory (not the
    *     pointer), and also considers claim files: a crashed claimant or
    *     orphan snapshot can never wedge the table (r11 fix, kept).
    * Readers are untouched: resolve `_latest` once, read an immutable dir. */
  def publishVersion(spark: SparkSession, root: String, df: DataFrame): Long = {
    import org.apache.hadoop.fs.Path
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(rootP)
    val names = fs.listStatus(rootP).map(_.getPath.getName)
    def vOf(n: String, suffix: String): Option[Long] =
      if (n.startsWith("v=") && n.endsWith(suffix))
        scala.util.Try(n.stripPrefix("v=").stripSuffix(suffix).toLong).toOption
      else None
    val seen = names.flatMap(n => vOf(n, "") orElse vOf(n, "._claim"))
    var next = (seen :+ -1L).max + 1L
    var attempts = 0
    var claimed = false
    while (!claimed) {
      if (claimSlot(fs, new Path(rootP, s"v=$next._claim"))) claimed = true
      else {
        attempts += 1
        if (attempts > 1000) throw new java.io.IOException(
          s"publish: could not claim a version at $root after $attempts attempts")
        next += 1 // another writer owns this N — take the next slot
      }
    }
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$root/v=$next")
    // Publication = creating the version's MARKER file, exclusively. The
    // "pointer" is max(_published/*): creation-only state converges to the
    // max under ANY interleaving of racing writers — there is no
    // read-modify-write window at all, which a single mutable `_latest`
    // file cannot achieve without a true FS-level compare-and-swap (a blind
    // rename-over lets a slower writer clobber a faster one's pointer).
    fs.mkdirs(new Path(rootP, "_published"))
    fs.create(new Path(rootP, s"_published/$next"), false).close()
    next
  }

  /** Atomic exclusive creation of a claim file. On HDFS/object stores,
    * `FileSystem.create(overwrite=false)` is the atomic primitive (namenode
    * test-and-set / conditional put). On the LOCAL filesystem Hadoop's
    * implementation is a non-atomic exists-check-then-create, so racing
    * local writers could both "win" a slot (observed as a `_temporary`
    * collision under the race spec); NIO `Files.createFile` (O_EXCL) is
    * the posix-atomic equivalent, so local schemes route through it. */
  private def claimSlot(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): Boolean =
    try {
      fs match {
        case _: org.apache.hadoop.fs.LocalFileSystem |
             _: org.apache.hadoop.fs.RawLocalFileSystem =>
          java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
        case _ => fs.create(p, false).close()
      }
      true
    } catch { case _: java.io.IOException => false }

  /** The live version number, if the table has ever been published: the
    * max over `_published/` markers. Falls back to a legacy `_latest`
    * pointer file for tables written before the marker scheme. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val pubDir = new Path(rootP, "_published")
    val markers =
      if (fs.exists(pubDir))
        fs.listStatus(pubDir).flatMap(s =>
          scala.util.Try(s.getPath.getName.toLong).toOption)
      else Array.empty[Long]
    if (markers.nonEmpty) Some(markers.max)
    else {
      val ptr = new Path(rootP, "_latest")
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        try {
          val buf = new Array[Byte](64)
          val n = in.read(buf)
          Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
        } finally in.close()
      }
    }
  }

  /** Read the LIVE snapshot (or a pinned `version` for time travel). The
    * returned frame reads an immutable directory — concurrent publishes
    * cannot tear it. */
  def readVersioned(spark: SparkSession, root: String,
                    version: Option[Long] = None): DataFrame = {
    val v = version.orElse(currentVersion(spark, root))
      .getOrElse(throw new IllegalStateException(s"no published version at $root"))
    spark.read.parquet(s"$root/v=$v")
  }

  /** Drop snapshots older than the newest `keep` (never the live one),
    * along with their publication markers and claim files. Unpublished
    * orphan dirs (crashed writers) below the cutoff are swept too — they
    * were never visible, and sweeping them keeps the root bounded. */
  def vacuumVersions(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    require(keep >= 1, "must keep at least the live version")
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sessionState.newHadoopConf())
    val published = currentVersion(spark, root).toSeq.flatMap { _ =>
      val pubDir = new Path(rootP, "_published")
      if (fs.exists(pubDir))
        fs.listStatus(pubDir).flatMap(s =>
          scala.util.Try(s.getPath.getName.toLong).toOption).toSeq.sorted
      else // legacy table: fall back to snapshot-dir listing
        fs.listStatus(rootP).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("v="))
          .flatMap(n => scala.util.Try(n.drop(2).toLong).toOption).toSeq.sorted
    }
    val cutoff = published.dropRight(keep)
    val doomed =
      if (cutoff.isEmpty) cutoff
      else { // sweep unpublished orphans below the newest doomed version too
        val hi = cutoff.max
        val all = fs.listStatus(rootP).filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("v="))
          .flatMap(n => scala.util.Try(n.drop(2).toLong).toOption)
        (cutoff ++ all.filter(v => v <= hi && !published.takeRight(keep).contains(v))).distinct.sorted
      }
    doomed.foreach { v =>
      fs.delete(new Path(rootP, s"v=$v"), true)
      fs.delete(new Path(rootP, s"v=$v._claim"), false)
      fs.delete(new Path(rootP, s"_published/$v"), false)
    }
    doomed.toSeq
  }
}
