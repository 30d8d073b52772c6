package graft.ann

/** Warm in-process serving over a persisted GRAPH (NSW-style) index — the
  * [[AnnServe]] twin for the beam-search rung, completing the warm-serving
  * story across the ANN ladder (ADC scan, two-stage rerank, graph walk).
  *
  * One loader pass reads the four artifacts (coarse centroids for query
  * routing, per-cell medoid entry points, the kNN adjacency, and this
  * shard's vectors — "a serving shard holds its vectors next to its
  * adjacency, exactly how HNSW deployments ship"); every query is then a
  * pure JVM beam search.
  *
  * Result identity (spec-pinned in PqSpec): replays
  * [[GraphAnn.topKFromIndex]] operation-for-operation — the nProbe=1 cell
  * route ((−cos ASC, centroid_id ASC)), per hop: expand frontier through
  * the adjacency, UNION the frontier, drop the query's own id, score
  * every candidate `round(cos, 6)` (BigDecimal HALF_UP — Spark's round),
  * keep the `beam` best by (cos DESC, node ASC); final ranking = the same
  * rule over the last frontier, top k.
  */
final class GraphServe private (
    centIds: Array[Long],
    centVecs: Array[Array[Float]],
    medoidOf: java.util.HashMap[Long, Long],
    adj: java.util.HashMap[Long, Array[Long]],
    vecs: java.util.HashMap[Long, Array[Float]],
    norms: java.util.HashMap[Long, java.lang.Double]) {

  import AnnServe.Hit

  private val centNorm: Array[Double] = centVecs.map { v =>
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  @inline private def lt(d1: Double, id1: Long, d2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && id1 < id2)
  }
  @inline private def gtScore(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  /** (score, id)-ranked top-`cap` of `nodes` under round6 cosine vs `qv`.
    * Returns (ids, scores) in rank order. */
  private def rankTop(nodes: java.util.HashSet[Long], qv: Array[Float],
                      qn: Double, cap: Int): (Array[Long], Array[Double]) = {
    val bs = new Array[Double](cap); val bid = new Array[Long](cap); var bn = 0
    val it = nodes.iterator()
    while (it.hasNext) {
      val nid = it.next()
      val nv = vecs.get(nid)
      if (nv != null) {
        val score = round6(dot(qv, nv) / (qn * norms.get(nid)))
        if (bn < cap || gtScore(score, nid, bs(bn - 1), bid(bn - 1))) {
          var j = if (bn < cap) bn else cap - 1
          while (j > 0 && gtScore(score, nid, bs(j - 1), bid(j - 1))) {
            bs(j) = bs(j - 1); bid(j) = bid(j - 1); j -= 1
          }
          bs(j) = score; bid(j) = nid
          if (bn < cap) bn += 1
        }
      }
    }
    (java.util.Arrays.copyOf(bid, bn), java.util.Arrays.copyOf(bs, bn))
  }

  def topK(queryId: Long, qv: Array[Float], k: Int, beam: Int,
           hops: Int): Array[Hit] = {
    require(k <= beam, s"k=$k must be <= beam=$beam")
    var qq = 0.0
    locally { var i = 0; while (i < qv.length) { qq += qv(i).toDouble * qv(i).toDouble; i += 1 } }
    val qn = math.sqrt(qq)
    // route: nearest cell by (−cos ASC, centroid_id ASC), its medoid enters
    var best = -1; var bestD = 0.0
    var c = 0
    while (c < centIds.length) {
      val d = -(dot(qv, centVecs(c)) / (qn * centNorm(c)))
      if (best < 0 || lt(d, centIds(c), bestD, centIds(best))) { best = c; bestD = d }
      c += 1
    }
    if (best < 0 || !medoidOf.containsKey(centIds(best))) return Array.empty
    var frontier: Array[Long] = Array(medoidOf.get(centIds(best)))
    var h = 0
    while (h < hops) {
      val cand = new java.util.HashSet[Long]()
      frontier.foreach { n =>
        cand.add(n)
        val ds = adj.get(n)
        if (ds != null) ds.foreach(cand.add)
      }
      cand.remove(queryId)
      frontier = rankTop(cand, qv, qn, beam)._1
      h += 1
    }
    // no query-id exclusion here: the Spark lane's final ranking runs over
    // the frontier verbatim (each hop already excluded the query, so for
    // hops ≥ 1 this is equivalent; hops = 0 keeps the entry row, as there)
    val fin = new java.util.HashSet[Long]()
    frontier.foreach(fin.add)
    val (ids, scores) = rankTop(fin, qv, qn, k)
    Array.tabulate(ids.length)(i => Hit(ids(i), (i + 1).toLong, scores(i)))
  }
}

object GraphServe {

  /** One loader pass over a [[GraphAnn.GraphIndex]]'s frames → the
    * resident structure (the serving shard's adjacency + vectors; the
    * broadcast-sized centroid/medoid artifacts replicate per node). */
  def load(idx: GraphAnn.GraphIndex): GraphServe = {
    import org.apache.spark.sql.functions.col
    val cents = idx.centroids
      .select(col("centroid_id").cast("long"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val medoids = new java.util.HashMap[Long, Long]()
    idx.medoids.select(col("centroid_id").cast("long"), col("entry").cast("long"))
      .collect().foreach(r => medoids.put(r.getLong(0), r.getLong(1)))
    val adj = new java.util.HashMap[Long, Array[Long]]()
    idx.edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().groupBy(_.getLong(0))
      .foreach { case (s, rows) => adj.put(s, rows.map(_.getLong(1))) }
    val vecs = new java.util.HashMap[Long, Array[Float]]()
    val norms = new java.util.HashMap[Long, java.lang.Double]()
    idx.vectors.select(col("cid").cast("long"), col("cv")).collect().foreach { r =>
      val v = r.getSeq[Float](1).toArray
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      vecs.put(r.getLong(0), v)
      norms.put(r.getLong(0), math.sqrt(acc))
    }
    new GraphServe(cents.map(_._1), cents.map(_._2), medoids, adj, vecs, norms)
  }
}
