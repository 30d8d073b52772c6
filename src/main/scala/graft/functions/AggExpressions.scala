package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.DataType

/** `min_by`/`max_by` with a two-part lexicographic ordering, flattened
  * into primitive aggregation-buffer slots.
  *
  * The builtin `min_by(v, struct(o1, o2))` is semantically right for a
  * tiebreakered open/close pick, but a struct-typed buffer attribute is
  * not UnsafeRow-mutable, so HashAggregateExec refuses the whole aggregate
  * and the plan degrades to SortAggregate — an extra per-partition sort on
  * the hottest path of the engine (every bars derivation). Flattening the
  * ordering into two primitive buffer attributes (long/double/date/…)
  * keeps the identical semantics and restores hash aggregation +
  * whole-stage codegen: all update/merge logic is pure Catalyst
  * expressions, so there is no ImperativeAggregate interpretation cost
  * either.
  *
  * Ordering: (o1, o2) compared lexicographically; rows with a NULL o1 are
  * ignored (same as builtin min_by's null-ordering handling for our
  * non-null usage). Ties on the full pair return the value of whichever
  * row is seen first — callers must make the pair unique-or-interchangeable
  * per group (the same contract the struct formulation had).
  */
case class MinMaxByPair(valueExpr: Expression, o1: Expression, o2: Expression,
                        isMin: Boolean)
  extends DeclarativeAggregate with TernaryLike[Expression] {

  override def first: Expression = valueExpr
  override def second: Expression = o1
  override def third: Expression = o2

  override def dataType: DataType = valueExpr.dataType
  override def nullable: Boolean = true
  override def prettyName: String = if (isMin) "min_by_pair" else "max_by_pair"

  private lazy val value = AttributeReference("value", valueExpr.dataType)()
  private lazy val best1 = AttributeReference("best1", o1.dataType)()
  private lazy val best2 = AttributeReference("best2", o2.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(value, best1, best2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, valueExpr.dataType),
    Literal.create(null, o1.dataType),
    Literal.create(null, o2.dataType))

  /** (x1,x2) strictly precedes (y1,y2) in the min/max direction. */
  private def better(x1: Expression, x2: Expression,
                     y1: Expression, y2: Expression): Expression = {
    def lt(a: Expression, b: Expression) =
      if (isMin) LessThan(a, b) else GreaterThan(a, b)
    Or(lt(x1, y1), And(EqualTo(x1, y1), lt(x2, y2)))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = And(IsNotNull(o1),
      Or(IsNull(best1), better(o1, o2, best1, best2)))
    Seq(
      If(take, valueExpr, value),
      If(take, o1, best1),
      If(take, o2, best2))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val takeRight = And(IsNotNull(best1.right),
      Or(IsNull(best1.left),
        better(best1.right, best2.right, best1.left, best2.left)))
    Seq(
      If(takeRight, value.right, value.left),
      If(takeRight, best1.right, best1.left),
      If(takeRight, best2.right, best2.left))
  }

  override lazy val evaluateExpression: Expression = value

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(valueExpr = newFirst, o1 = newSecond, o2 = newThird)
}

object AggExpressions {

  def minByPair(v: Column, o1: Column, o2: Column): Column =
    ColumnBridge.column(MinMaxByPair(ColumnBridge.expression(v),
      ColumnBridge.expression(o1), ColumnBridge.expression(o2),
      isMin = true).toAggregateExpression())

  def maxByPair(v: Column, o1: Column, o2: Column): Column =
    ColumnBridge.column(MinMaxByPair(ColumnBridge.expression(v),
      ColumnBridge.expression(o1), ColumnBridge.expression(o2),
      isMin = false).toAggregateExpression())
}
