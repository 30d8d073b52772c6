package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import graft.CrashBudget

/** Shared FS protocol for the two epoch-maintained index families — the
  * saved IVF-PQ index ([[graft.ann.Pq]]) and the saved LSH dedup index
  * ([[graft.dedup.Dedup]]). Both maintain a directory of base artifact
  * tables plus `epochs/<id>/` increments committed by a creation-only
  * `_COMMITTED` marker, tombstone shards under `tombstones/`, and a
  * staged-swap compaction under `compact_tmp/`. The protocol used to live
  * twice (one copy per family); r17 centralizes it so the
  * crash-interleaving fuzz audits ONE implementation through both
  * consumers, and fixes the r16 ADVICE findings in one place:
  *
  *  - (medium) a resumed compaction deleted the WHOLE `epochs/` dir, so
  *    epochs committed after a crashed compaction's `_COMPLETE` were
  *    silently lost. The `_COMPLETE` marker is now a MANIFEST of the
  *    folded epoch ids (written atomically via temp + rename); resume
  *    deletes only those, and every MUTATOR first finishes a pending
  *    compaction, so nothing can ever commit "behind" one.
  *  - (low) epoch appends staged their artifacts DIRECTLY in the epoch dir
  *    with a check-then-act marker test, so two racing writers (zombie
  *    driver after failover) could tear each other's artifacts. Appends
  *    now stage under an attempt-unique dot-dir and CLAIM the epoch with
  *    one atomic rename — whatever commits is one attempt's complete set.
  *  - (low) epoch reads union'd one plan node per epoch (foldLeft
  *    unionByName) — linear plan growth under continuous ingest. Reads are
  *    now ONE multi-path parquet load, O(1) in epoch count.
  */
private[graft] object EpochStore {

  def fsFor(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed epoch dir NAMES under `dir/epochs`, ascending by numeric id
    * when numeric (epoch ids are longs). Crashed attempts — unmarked dirs,
    * or dot-prefixed staging dirs — are invisible. */
  def committedEpochs(fs: FileSystem, dir: String): Seq[String] = {
    val p = new Path(s"$dir/epochs")
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .filter(st => fs.exists(new Path(st.getPath, "_COMMITTED")))
      .map(_.getPath.getName)
      .sortBy(n => (n.length, n))
  }

  /** Committed epoch table paths for one artifact `sub` — feed these to a
    * single multi-path `spark.read.parquet(...)` (never a per-epoch union:
    * the plan must stay O(1) in epoch count). */
  def committedEpochPaths(fs: FileSystem, dir: String, sub: String): Seq[String] =
    committedEpochs(fs, dir).map(e => s"$dir/epochs/$e/$sub")

  private def completePath(dir: String) = new Path(s"$dir/compact_tmp/_COMPLETE")

  /** True when a compaction has COMMITTED its fold (`_COMPLETE` manifest
    * present) but its cleanup/swap has not finished. Readers treat the
    * folded tables as authoritative; mutators must finish the cleanup
    * before touching the index ([[finishCompaction]]). */
  def pendingCompaction(fs: FileSystem, dir: String): Boolean =
    fs.exists(completePath(dir))

  /** The epoch names a pending compaction FOLDED — the `_COMPLETE`
    * manifest content. Epochs not listed here postdate the fold and must
    * survive its cleanup. */
  def foldedEpochs(fs: FileSystem, dir: String): Seq[String] = {
    val in = fs.open(completePath(dir))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Atomic manifest commit: content to a temp name, RENAME to
    * `_COMPLETE` — the marker appears with its full content or not at all
    * (the rename-as-commit discipline; a half-written marker can never
    * read as an empty fold). */
  private def commitCompleteMarker(fs: FileSystem, dir: String,
                                   folded: Seq[String],
                                   budget: CrashBudget): Unit = {
    val tmp = new Path(s"$dir/compact_tmp/._COMPLETE.tmp")
    budget.step("compact-manifest-write") {
      val out = fs.create(tmp, true)
      try out.write(folded.mkString("\n").getBytes("UTF-8")) finally out.close()
    }
    budget.step("compact-manifest-rename") {
      if (!fs.rename(tmp, completePath(dir)))
        throw new java.io.IOException(s"compaction manifest rename failed under $dir")
    }
  }

  /** Finish (or resume) a pending compaction's cleanup: swap each folded
    * table into place, delete ONLY the manifest's epoch dirs (newer
    * committed epochs survive for the next fold), sweep crashed staging
    * dirs, drop tombstones and `compact_tmp`. Idempotent and resumable
    * from any crash point; pure FS ops — no Spark jobs. Tombstone deletion
    * is safe here because mutators finish a pending compaction BEFORE
    * writing, so every tombstone present predates the fold that already
    * applied it. Returns true iff a pending compaction was finished. */
  def finishCompaction(fs: FileSystem, dir: String, subs: Seq[String],
                       budget: CrashBudget): Boolean = {
    if (!pendingCompaction(fs, dir)) return false
    val folded = foldedEpochs(fs, dir)
    subs.foreach { sub =>
      val t = new Path(s"$dir/compact_tmp/$sub")
      if (fs.exists(t)) {
        budget.step(s"compact-swap-$sub-delete") {
          fs.delete(new Path(s"$dir/$sub"), true); ()
        }
        budget.step(s"compact-swap-$sub-rename") {
          if (!fs.rename(t, new Path(s"$dir/$sub")))
            throw new java.io.IOException(s"compaction swap rename failed: $dir/$sub")
        }
      }
    }
    folded.foreach { e =>
      budget.step(s"compact-drop-epoch-$e") {
        fs.delete(new Path(s"$dir/epochs/$e"), true); ()
      }
    }
    val epochsPath = new Path(s"$dir/epochs")
    if (fs.exists(epochsPath)) {
      // crashed append attempts' staging dot-dirs are dead weight — sweep
      fs.listStatus(epochsPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("."))
        .foreach { st =>
          budget.step(s"compact-sweep-stage-${st.getPath.getName}") {
            fs.delete(st.getPath, true); ()
          }
        }
      // unfolded committed epochs keep the dir alive; empty dirs retire
      if (fs.listStatus(epochsPath).isEmpty)
        budget.step("compact-drop-epochs-dir") { fs.delete(epochsPath, true); () }
    }
    budget.step("compact-drop-tombstones") {
      fs.delete(new Path(s"$dir/tombstones"), true); ()
    }
    budget.step("compact-drop-tmp") {
      fs.delete(new Path(s"$dir/compact_tmp"), true); ()
    }
    true
  }

  /** Full compaction: the fold phase runs only when no `_COMPLETE` is
    * pending (a pending one's fold is authoritative — re-folding would
    * double-count), writes via `writeFolded(foldedEpochIds, budget)` into
    * `dir/compact_tmp/<sub>`, commits the manifest atomically, then
    * finishes the cleanup. `writeFolded` MUST fold exactly the epoch ids
    * it is handed (they become the manifest — the cleanup deletes exactly
    * those dirs). */
  def compact(fs: FileSystem, dir: String, subs: Seq[String],
              budget: CrashBudget)
             (writeFolded: (Seq[String], CrashBudget) => Unit): Unit = {
    if (!pendingCompaction(fs, dir)) {
      val folded = committedEpochs(fs, dir)
      writeFolded(folded, budget)
      commitCompleteMarker(fs, dir, folded, budget)
    }
    finishCompaction(fs, dir, subs, budget)
    ()
  }

  /** EXACTLY-ONCE staged epoch append, shared by both families:
    *
    *  1. a pending compaction is FINISHED first — its resumed cleanup
    *     would otherwise delete this epoch (the r16 ADVICE medium);
    *  2. a committed epoch (marker present) returns false immediately —
    *     a replayed micro-batch cannot double-append;
    *  3. `writeStage(stageDir, budget)` materializes the artifacts under
    *     an attempt-unique dot-prefixed staging dir (invisible to reads);
    *  4. the CLAIM is one atomic rename of the staging dir to
    *     `epochs/<id>` — racing attempts can no longer tear each other's
    *     artifacts (whatever commits is ONE attempt's complete set); a
    *     crashed attempt's unmarked leftover is deleted before the claim;
    *  5. the creation-only `_COMMITTED` marker lands LAST; a lost race
    *     surfaces loudly instead of silently double-committing.
    *
    * Returns true iff this call committed the epoch. */
  def appendEpoch(fs: FileSystem, dir: String, subs: Seq[String],
                  epochId: Long, budget: CrashBudget)
                 (writeStage: (String, CrashBudget) => Unit): Boolean = {
    finishCompaction(fs, dir, subs, budget)
    val epochDir = new Path(s"$dir/epochs/$epochId")
    val marker = new Path(s"$dir/epochs/$epochId/_COMMITTED")
    if (fs.exists(marker)) return false
    val stage = s"$dir/epochs/.stage_${epochId}_${java.util.UUID.randomUUID}"
    writeStage(stage, budget)
    budget.step("append-claim-rename") {
      if (fs.exists(epochDir) && !fs.exists(marker)) fs.delete(epochDir, true)
      if (!fs.rename(new Path(stage), epochDir)) {
        fs.delete(new Path(stage), true)
        if (!fs.exists(marker))
          throw new IllegalStateException(
            s"epoch $epochId claim rename failed with no committed marker under $dir")
      }
    }
    if (fs.exists(marker)) return false // lost the race to a concurrent committer
    budget.step("append-marker") {
      try fs.create(marker, false).close()
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"concurrent commit detected for epoch $epochId under $dir", e)
      }
    }
    true
  }
}
