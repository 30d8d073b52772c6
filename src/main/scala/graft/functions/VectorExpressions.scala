package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the ANN hot path: dot product of two
  * `array<float>` columns, accumulated left-to-right in double.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` (same fold order, so
  * oracle-compared results don't change) but with `doGenCode` emitting a
  * tight primitive loop over the two `ArrayData` — no intermediate array
  * allocation per row, stays inside whole-stage codegen. At 100 TB the
  * brute-force scorer is `corpus_rows × queries × dims` multiplies; this
  * expression is that inner loop.
  */
case class VecDotFloat(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // reads go through ArrayData.getFloat — any other element type would be
  // silent garbage (the HierArgMin ADVICE r16 defect class). Fail analysis.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two array<float> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column wrapper for [[VecDotFloat]] (Spark 4 Column↔Expression bridge). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDotFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `vec_dot` for SQL use in the given session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotFloat(exprs(0), exprs(1)), "scala_udf")
}
