package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = Graph.Scale

  test("pageRank: symmetric 2-cycle is a fixed point (each node keeps S/2-ish)") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    // exact fixed-point walk: r0 = S/2; each round r = (S·15//100)//2 + (r·85)//100
    var expect = S / 2
    for (_ <- 0 until 3) expect = (S * 15 / 100) / 2 + (expect * 85) / 100
    assert(r("a") == expect && r("b") == expect, s"got $r, want $expect")
  }

  test("pageRank: star center out-ranks leaves; total mass conserved up to truncation") {
    // undirected star: center c, leaves l1..l4
    val pairs = (1 to 4).map(i => ("c", s"l$i"))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(String, Long)].collect().toMap
    assert((1 to 4).forall(i => r("c") > r(s"l$i")), s"center must dominate: $r")
    assert((1 to 4).map(i => r(s"l$i")).distinct.size == 1, "leaves must tie")
    val mass = r.values.sum
    // each of 3 rounds truncates ≤ 1 unit per node per DIV (2 DIVs/round)
    assert(mass <= S && mass > S - 3L * 2 * 5 - 5, s"mass $mass drifted from $S")
  }

  test("pageRank: deterministic across runs (bit-equal ranks)") {
    val t = graft.sources.TestData(spark, sf0001)
    val pairs = t.orders
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("C"), col("o_custkey")).as("c"),
        concat(lit("S"), col("l_suppkey")).as("s")).distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    def run() = Graph.pageRank(edges, "src", "dst", iters = 2)
      .as[(String, Long)].collect().toSet
    assert(run() == run())
  }
}
