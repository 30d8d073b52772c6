package graft.tools

/** Prints the physical plans of the checkpoint-internal subtrees the r18
  * optimizations changed — `localCheckpoint` barriers hide them from the
  * gate-level PlanAudit output, so the plan evidence for those claims is
  * captured here (plans/r18 subtree files). */
object SubtreePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local(appName = "graft-subtree-plans")
    val docs = graft.sources.TestData(spark, sfDir).documents
    println("=== minhash_signatures: physical plan ===")
    graft.dedup.Dedup.md5KernelSignatures(docs, "doc_id", "text", 3, 16)
      .explain("formatted")
    println("=== knn_graph_edges: physical plan ===")
    val e = graft.sources.TestData(spark, sfDir).embeddings
    graft.ann.GraphAnn.knnGraph(e, "vec_id", "embedding", 16, 12)
      .explain("formatted")
    // r19: the shingle + pair-generation subtrees (both sit behind
    // ngramJaccard's localCheckpoint in every consumer gate) — the n-gram
    // kernel and the sorted-pairs kernel replace the interpreted HOFs here
    println("=== word_shingles: physical plan ===")
    graft.dedup.Dedup.wordShingles(docs, "doc_id", "text", 3)
      .explain("formatted")
    println("=== jaccard_pairs: physical plan ===")
    graft.dedup.Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5, 100)
      .explain("formatted")
    spark.stop()
  }
}
