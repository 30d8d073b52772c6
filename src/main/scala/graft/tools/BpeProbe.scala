package graft.tools

import graft.Sessions
import graft.functions.Tokenizer

/** Job-count evidence for the two BPE training paths (VERDICT r10 item 7):
  * the per-merge distributed loop vs the driver-local merge loop over the
  * collected (vocabulary-bound) word table, at nMerges=64 on the documents
  * fixture. Emits one JSON line; redirect into docs/BPE_JOBS_r{N}.json.
  *
  * Usage: runMain graft.tools.BpeProbe [sfDir] [nMerges]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = Sessions.local(appName = "graft-bpe-probe")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    def measure(f: => Long): (Long, Int, Double) = {
      jobs.set(0)
      spark.sparkContext.addSparkListener(l)
      try {
        val t0 = System.nanoTime()
        val rows = f
        var last = -1; var stable = 0; var waited = 0
        while (stable < 3 && waited < 10000) {
          Thread.sleep(100); waited += 100
          if (jobs.get() == last) stable += 1
          else { stable = 0; last = jobs.get() }
        }
        (rows, jobs.get(), (System.nanoTime() - t0) / 1e9)
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val (rowsD, jobsD, secD) =
      measure(Tokenizer.trainBpe(docs, "text", nMerges).count())
    val (rowsL, jobsL, secL) =
      measure(Tokenizer.trainBpeLocal(docs, "text", nMerges).count())
    require(rowsD == rowsL, s"merge counts diverge: $rowsD vs $rowsL")
    println(f"""{"probe":"bpe_jobs","sf_dir":"$sfDir","n_merges":$nMerges,""" +
      f""""distributed":{"jobs":$jobsD,"sec":$secD%.2f},""" +
      f""""local":{"jobs":$jobsL,"sec":$secL%.2f},""" +
      f""""jobs_ratio":${jobsD.toDouble / math.max(jobsL, 1)}%.1f}""")
    spark.stop()
  }
}
