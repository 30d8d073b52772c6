package graft

import graft.ann.Ann

/** k-means|| initialization: determinism, shape, and the quality claim it
  * exists for — beating the strided value-predicate seed when cluster MASS
  * is skewed (the strided pick lands every seed inside the dense region;
  * cost-proportional oversampling must find the small far clusters). */
class KmeansInitSpec extends SparkSpec {
  import spark.implicits._

  // 4 orthogonal cluster directions in 8 dims; 90% of the mass (ids
  // 0..899) in cluster 0, three small clusters (B/C/D) behind it. Jitter
  // on dims 4..7 keeps within-cluster cosine high without moving the axis.
  private lazy val skewed = {
    val rows = (0 until 1000).map { i =>
      val c = if (i < 900) 0 else if (i < 930) 1 else if (i < 970) 2 else 3
      val v = Array.fill(8)(0.0f)
      v(c) = 1.0f
      v(4 + c) = 0.05f * (((i * 31) % 7) - 3) / 3.0f
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansParallelInit returns exactly k float centroids, re-keyed 0..k-1") {
    val cent = Ann.kmeansParallelInit(skewed, "vec_id", "embedding", k = 4)
    val ids = cent.select("centroid_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L, 3L))
    assert(cent.schema("centroid").dataType.simpleString == "array<float>")
  }

  test("kmeansParallelInit is deterministic across runs") {
    def run() = Ann.kmeansParallelInit(skewed, "vec_id", "embedding", k = 4)
      .as[(Long, Seq[Float])].collect().toSet
    assert(run() == run())
  }

  test("beats the strided seed on skewed cluster mass (finds all 4 clusters)") {
    val strided = Ann.ivfCentroids(skewed, "vec_id", "embedding", nLists = 4)
    val km = Ann.kmeansParallelInit(skewed, "vec_id", "embedding", k = 4)
    val costStrided = Ann.quantizerCost(skewed, "vec_id", "embedding", strided)
    val costKm = Ann.quantizerCost(skewed, "vec_id", "embedding", km)
    // stride = 250 puts all 4 strided seeds inside cluster 0 (ids 0..899):
    // every B/C/D point pays ~full spherical cost. k-means|| must cut the
    // objective by at least 5× here, not just edge it out.
    assert(costKm * 5 < costStrided,
      s"k-means|| cost $costKm not << strided cost $costStrided")
    // and it actually covers the three small clusters: one centroid per axis
    val axes = km.as[(Long, Seq[Float])].collect()
      .map(_._2.zipWithIndex.maxBy(_._1.toDouble)._2).toSet
    assert(axes == Set(0, 1, 2, 3), s"centroid axes $axes miss a cluster")
  }
}
