package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Sessions

/** Direct evidence for the r15 two-level-assignment claim: the flat IVF
  * coarse assignment is O(N·nLists) per corpus pass, the hierarchical one
  * O(N·(√nLists·(1+topProbe))) — a term the 10× GRAPH probe cannot see
  * because at probe scale the Σ|cell|² edge build dominates. This probe
  * isolates assignment: same corpus, same centroid table, flat vs
  * two-level wall time across an nLists sweep (the 100 TB regime is the
  * top rows — nLists grows with the corpus under the occupancy-constant
  * rule, so the per-row scan is the term that dies first).
  *
  * Usage: runMain graft.tools.AssignProbe [baseDir] [k]
  * (k > 1 probes the ScaleProbe-replicated corpus at that factor).
  */
object AssignProbe {
  private def time(df: => DataFrame): Double = {
    df.count() // warm
    (0 until 2).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 10
    val spark: SparkSession = Sessions.local(appName = "graft-assign-probe")
    val dir =
      if (k <= 1) baseDir
      else s"${sys.props("java.io.tmpdir")}/graft_scale${k}_" +
        baseDir.replaceAll("[^A-Za-z0-9.]", "_")
    if (k > 1) ScaleProbe.buildScaled(spark, baseDir, dir, k, Set("embeddings"))
    val e = graft.sources.TestData(spark, dir).embeddings.localCheckpoint()
    val n = e.count()
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val rows = Seq(64, 256, 1024, 4096).map { nLists =>
      val cents = graft.ann.Ann.ivfCentroids(e, "vec_id", "embedding", nLists,
        lloydIters = 0).localCheckpoint()
      val flatSec = time(
        graft.ann.Ann.assignCells(e, "vec_id", "embedding", cents))
      val hierSec = time(
        graft.ann.Ann.hierarchicalAssign(e, "vec_id", "embedding", cents,
          nLists))
      System.err.println(f"[assign] nLists=$nLists%5d flat=$flatSec%7.2fs " +
        f"two-level=$hierSec%7.2fs speedup=${flatSec / hierSec}%5.2f")
      s""""$nLists":{"flat":${f2(flatSec)},"two_level":${f2(hierSec)},"speedup":${f2(flatSec / hierSec)}}"""
    }
    println(s"""{"metric":"assign_sweep","n":$n,"dir":"$dir","by_nlists":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
