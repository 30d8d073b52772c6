package graft.tools

import org.apache.spark.sql.functions._

/** One-off: sweep GraphAnn (degree, hops, beam) recall to pick gate params. */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-graphann-probe")
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.TestData(spark, sfDir).embeddings.localCheckpoint()
    val q = e.filter(col("vec_id") < 50).localCheckpoint()
    val exact = graft.ann.Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val exactN = exact.count().toDouble
    for ((deg, hops, beam) <- Seq((12, 5, 16), (16, 8, 32))) {
      val t0 = System.nanoTime()
      val got = graft.ann.GraphAnn.graphTopK(e, q, "vec_id", "embedding", 5,
        nLists = 16, degree = deg, beam = beam, hops = hops)
        .select("query_id", "neighbor_id")
      val hit = got.join(exact, Seq("query_id", "neighbor_id")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[gprobe] deg=$deg%2d hops=$hops beam=$beam%2d recall=${hit / exactN}%.3f ${sec}%.1fs")
    }
    spark.stop()
  }
}
