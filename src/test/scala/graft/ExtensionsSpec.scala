package graft

import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.functions.VecDotFloat

/** The GraftExtensions optimizer rule: the declarative fold dot-product
  * compiles to the codegen'd VecDotFloat, bit-identically, and only for
  * float arrays. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
    (2L, Array(0.1f, 0.2f, 0.3f), Array(1.5f, 2.5f, -3.5f)))
    .toDF("id", "a", "b")

  // parquet-backed: a LocalRelation input would be constant-folded away
  // before the plan assertion could see the expression
  private lazy val embs = graft.sources.TestData(spark, sf0001).embeddings

  test("fold dot-product on float arrays is rewritten to VecDotFloat") {
    val df = embs.select(Ann.dotFold($"embedding", $"embedding").as("d"))
    val rewritten = df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VecDotFloat]))
    assert(rewritten, df.queryExecution.optimizedPlan.toString)
  }

  test("rewrite is bit-identical to the explicit VecDotFloat and to Scala") {
    val both = vecs.select($"id", Ann.dotFold($"a", $"b").as("fold"),
        Ann.dot($"a", $"b").as("native"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (_, f, n) =>
      assert(java.lang.Double.doubleToLongBits(f) === java.lang.Double.doubleToLongBits(n))
    }
    val m = both.map(r => r._1 -> r._2).toMap
    // manual left fold in the same order
    assert(m(1L) === (1.0f.toDouble * 0.5f + 2.0f.toDouble * -1.0f) + 3.0f.toDouble * 2.0f)
  }

  test("AsOfJoinExec: custom operator plans via the injected strategy and matches the composed lane") {
    val t = sources.TestData(spark, sf0001)
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_ns", $"value".as("purchase_value"))
    val clicks = t.events.filter($"event_type" === "click")
      .select($"user_id", $"ts_ns".as("cts"), $"value".as("click_value"))
    val exec = graft.plans.AsOfJoinExec.asOfMerge(purchases, clicks,
      "user_id", "ts_ns", "cts", Seq("click_value"))
    // the strategy actually planned OUR node, with the planner contract
    // (exchange + sort per side) satisfied by EnsureRequirements
    val plan = exec.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips the Exec suffix
    assert(plan.contains("Sort") && plan.contains("Exchange"), plan)
    // frame-for-frame equal to the composed window lane
    val composed = graft.ops.Joins.asOf(purchases, clicks, Seq("user_id"),
        "ts_ns", "cts", Seq("click_value"))
      .select("user_id", "event_id", "purchase_value", "click_value")
    val e = exec.select("user_id", "event_id", "purchase_value", "click_value")
    assert(e.count() === purchases.count(), "left-outer: every left row emits")
    assert(e.exceptAll(composed).isEmpty && composed.exceptAll(e).isEmpty,
      "merge exec must equal the tagged-union window lane")
  }

  test("AsOfJoinExec edges: empty right, null keys/times, pre-key matches never leak") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
        (3L, 7L, "d")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 15L, 200.0), (2L, 6L, 300.0))
      .toDF("k", "rt", "v")
    val out = graft.plans.AsOfJoinExec.asOfMerge(left, right, "k", "t", "rt", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(out === Map("a" -> Some(100.0), "b" -> Some(200.0),
      "c" -> None, "d" -> None))
    // empty right side: all nulls, no crash
    val none = graft.plans.AsOfJoinExec.asOfMerge(left,
        right.filter($"k" < 0), "k", "t", "rt", Seq("v"))
      .filter($"v".isNotNull).count()
    assert(none === 0L)
    // null keys and null times match nothing (SQL equality semantics)
    val ln = Seq((Some(1L), Some(10L), "x"), (None, Some(10L), "nk"),
        (Some(1L), None, "nt")).toDF("k", "t", "tag")
    val rn = Seq((Some(1L), Some(5L), 1.0), (None, Some(1L), 9.0))
      .toDF("k", "rt", "v")
    val outN = graft.plans.AsOfJoinExec.asOfMerge(ln, rn, "k", "t", "rt", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(outN === Map("x" -> Some(1.0), "nk" -> None, "nt" -> None))
    // a null-TIME right row sorts FIRST within its key (Ascending = nulls
    // first): the cursor must consume and discard it, or every later valid
    // right row of the key is unreachable (the r11 ADVICE stall)
    val lStall = Seq((1L, 10L, "p"), (1L, 20L, "q"), (2L, 10L, "r"))
      .toDF("k", "t", "tag")
    val rStall = Seq((Some(1L), Option.empty[Long], -1.0),
        (Some(1L), Some(5L), 7.0), (Some(1L), Some(15L), 8.0),
        (Some(2L), Option.empty[Long], -2.0))
      .toDF("k", "rt", "v")
    val outS = graft.plans.AsOfJoinExec.asOfMerge(lStall, rStall, "k", "t", "rt", Seq("v"))
      .select($"tag", $"v").as[(String, Option[Double])].collect().toMap
    assert(outS === Map("p" -> Some(7.0), "q" -> Some(8.0), "r" -> None),
      "null-time right rows must be consumed, not stall the merge cursor")
  }

  test("double arrays and non-dot folds are NOT rewritten") {
    val dd = embs.select(Ann.dotFold($"embedding".cast("array<double>"),
      $"embedding".cast("array<double>")).as("d"))
    assert(!dd.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VecDotFloat])))
    val sumFold = embs.select(
      aggregate(zip_with($"embedding", $"embedding", (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
    assert(!sumFold.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VecDotFloat])))
  }
}
