package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VecDotFloat

/** SparkSessionExtensions wiring for cluster deployments:
  *
  * ```
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * ```
  *
  * Registers the engine's native expressions for SQL use (`vec_dot`).
  * Interactive sessions can instead call
  * `VectorExpressions.register(spark)` after the fact.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDotFloat].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDotFloat(exprs(0), exprs(1))))
  }
}
