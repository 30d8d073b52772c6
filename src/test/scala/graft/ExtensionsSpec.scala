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
