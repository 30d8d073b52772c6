package graft.tools
object KnnPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(appName = "knn-plan-probe")
    val e = graft.sources.TestData(spark, "/root/testdata/sf0.1").embeddings
    val g = graft.ann.GraphAnn.knnGraph(e, "vec_id", "embedding", 16, 12)
    g.explain("formatted")
    val t0 = System.nanoTime()
    g.write.format("noop").mode("overwrite").save()
    println(f"knnGraph wall: ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    g.write.format("noop").mode("overwrite").save()
    println(f"knnGraph wall2: ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
