package graft.tools

import graft.Sessions
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Evidence for the r10 de-risking of [[Dedup.dedupAgainstIndex]] (VERDICT
  * item 4): the shingle-store restriction is now a LEFT SEMI join with NO
  * forced broadcast, so a pathological ingest batch whose candidate set
  * exceeds the broadcast limit degrades to a shuffled semi-join instead of
  * killing the job.
  *
  * The probe runs the SAME dup-heavy batch (every saved doc re-ingested,
  * so docsInPlay ≈ the whole corpus — the worst case the old
  * `broadcast(docsInPlay)` hint was blind to) under two thresholds:
  *   - default (10 MB): AQE broadcasts the small side — the common case;
  *   - 1 KB: stands in for "docsInPlay exceeds the limit" — the planner
  *     must fall back to a shuffled join and still finish with identical
  *     verdicts. A forced-broadcast hint would have ignored this threshold
  *     entirely (and died at the 8 GB broadcast hard cap at real scale).
  *
  * Emits one JSON line; redirect into docs/DEDUP_INDEX_r{N}.json.
  */
object DedupIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-dedup-index-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.TestData(spark, sfDir).documents
    val dir = s"/tmp/graft_dedup_probe_${ProcessHandle.current().pid()}"
    val old = docs.filter(col("doc_id") % 5 =!= 4)
    Dedup.buildLshIndex(old, "doc_id", "text", dir)
    // worst case: re-ingest the ENTIRE saved corpus (every doc collides
    // with its own saved buckets) shifted to fresh ids
    val batch = old.select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    def run(thresholdBytes: Long): (Long, Long, Double, String) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBytes)
      val t0 = System.nanoTime()
      val out = Dedup.dedupAgainstIndex(spark, dir, batch, "doc_id", "text")
      val agg = out.agg(count(lit(1)), sum(col("is_dup").cast("long"))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      // The semi join runs EAGERLY inside dedupAgainstIndex's
      // localCheckpoint, so it is absent from `out`'s executed plan —
      // probe the join SITE separately: the saved shingle store
      // semi-joined to a docsInPlay-shaped id set under the same threshold.
      val ids = batch.select(col("doc_id"))
      val semi = spark.read.parquet(s"$dir/shingles")
        .join(ids, Seq("doc_id"), "left_semi")
      semi.write.format("noop").mode("overwrite").save()
      val semiLines = semi.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("LeftSemi")).toSeq
      val shape =
        if (semiLines.exists(_.contains("BroadcastHashJoin"))) "broadcast"
        else if (semiLines.exists(l =>
          l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))) "shuffled"
        else "other"
      (agg.getLong(0), agg.getLong(1), sec, shape)
    }
    val (nDef, dupDef, secDef, shapeDef) = run(10L * 1024 * 1024)
    val (nLow, dupLow, secLow, shapeLow) = run(1024L)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    require(nDef == nLow && dupDef == dupLow,
      s"verdicts must not depend on join strategy: ($nDef,$dupDef) vs ($nLow,$dupLow)")
    println(f"""{"probe":"dedup_index_semi","sf_dir":"$sfDir","batch_rows":$nDef,"dups":$dupDef,""" +
      f""""default_threshold":{"sec":$secDef%.2f,"join":"$shapeDef"},""" +
      f""""tiny_threshold":{"sec":$secLow%.2f,"join":"$shapeLow"},""" +
      f""""identical_verdicts":true}""")
    spark.stop()
  }
}
