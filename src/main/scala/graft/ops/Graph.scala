package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as dataframe programs.
  *
  * PageRank here is FIXED-POINT: ranks are scaled BIGINTs (`Scale` =
  * 10¹²) and every update is integer arithmetic — `DIV` for the
  * degree/damping splits, exact BIGINT sums for the message aggregation.
  * Two reasons, both scale-driven:
  *  - determinism: double message sums associate per-partition (a groupBy
  *    sum's order is the scheduler's choice), so float PageRank drifts
  *    run-to-run and engine-to-engine; integer sums are associative, so
  *    the result is bit-equal everywhere and the DuckDB oracle replays it
  *    with `//` (CLAUDE.md rule-1 applied to an iterative algorithm).
  *  - convergence bookkeeping: at 10⁹ nodes a deterministic fixed point
  *    means an incremental re-run can diff ranks exactly instead of
  *    epsilon-comparing.
  * The truncation the integer DIV introduces is ≤ nodes·iters / Scale of
  * total mass — at Scale 10¹² it's noise far below any ranking use.
  *
  * Iteration discipline (rule 8): each round `localCheckpoint`s the rank
  * frame — PageRank lineage otherwise grows by a join+agg per round and
  * analysis goes superlinear.
  */
object Graph {

  val Scale: Long = 1000000000000L // 10^12 fixed-point scale

  /** Fixed-iteration fixed-point PageRank over an edge list.
    *
    * `edges` rows are (src → dst); pass both directions for an undirected
    * graph. Nodes with no OUT-edges (dangling) keep their teleport mass
    * only — the standard simplification; feed symmetric edges to avoid
    * it. Returns (`node`, `rank_fp`) with `rank_fp` on the [[Scale]]
    * fixed-point grid.
    *
    * Per round: contrib = rank DIV out_degree per edge, one shuffle on
    * dst for the BIGINT message sum, then
    * rank' = (Scale·(1−d)) DIV n + (d·Σcontrib) — damping as the integer
    * pair (`dampNum` DIV `dampDen`). The damping multiply happens BEFORE
    * the DIV (`(Σ·num) DIV den`) so only one truncation occurs.
    */
  def pageRank(edges: DataFrame, src: String, dst: String, iters: Int,
               dampNum: Long = 85, dampDen: Long = 100,
               checkpoint: Boolean = true): DataFrame = {
    require(iters >= 0 && dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      "degenerate PageRank parameters")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val base = (Scale * (dampDen - dampNum) / dampDen) / n // driver-side: exact int ops
    var ranks = nodes.withColumn("rank_fp", lit(Scale / n))
    if (checkpoint) ranks = ranks.localCheckpoint(eager = true)
    for (_ <- 0 until iters) {
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"), expr("rank_fp div out_deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("msg"))
      ranks = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"(coalesce(msg, 0L) * $dampNum) div $dampDen"))
            .as("rank_fp"))
      if (checkpoint) ranks = ranks.localCheckpoint(eager = true)
    }
    ranks
  }
}
