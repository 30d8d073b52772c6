package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.VecDotFloat

/** Catalyst optimizer rule: rewrite the declarative fold dot-product
  * pattern
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  * on two `array<float>` columns into the codegen'd [[VecDotFloat]]
  * expression — a tight primitive loop with no per-row intermediate array.
  *
  * This is extension point (c) of the build guidance: callers keep writing
  * the portable declarative form (`Ann.dotFold`, also the form an oracle
  * replays as `list_reduce`), and the optimizer swaps in the native
  * expression. [[VecDotFloat]] accumulates left-to-right in double — the
  * SAME fold order — so results are bit-identical and oracle-compared
  * queries are unaffected.
  *
  * The match is deliberately narrow: both inputs must be `array<float>`,
  * the zip lambda exactly `cast(x) * cast(y)` over its own two variables,
  * the merge lambda exactly `acc + v`, zero exactly `0.0d`, finish the
  * identity. Equal-length arrays are assumed (every engine vector column
  * is fixed-dim): on ragged input the fold yields null via zip_with's null
  * padding while VecDotFloat dots the common prefix.
  */
object FoldDotProductToVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double), variables in order. */
  private def isCastMultiply(f: Expression, args: Seq[NamedExpression]): Boolean =
    (f, args) match {
      case (Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                     Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable)) =>
        x.exprId == a.exprId && y.exprId == b.exprId
      case _ => false
    }

  /** (acc, v) -> acc + v, variables in order. */
  private def isAccAdd(f: Expression, args: Seq[NamedExpression]): Boolean =
    (f, args) match {
      case (Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable)) =>
        l.exprId == acc.exprId && r.exprId == v.exprId
      case _ => false
    }

  private def isIdentity(f: LambdaFunction): Boolean = (f.function, f.arguments) match {
    case (v: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) => v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(mulF, mulArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(addF, addArgs, _),
          finish: LambdaFunction)
        if isFloatArray(l) && isFloatArray(r) &&
          isCastMultiply(mulF, mulArgs) && isAccAdd(addF, addArgs) &&
          isIdentity(finish) =>
      VecDotFloat(l, r)
  }
}

/** `spark.sql.extensions` entry point registering the graft rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => FoldDotProductToVecDot)
    // whole-operator extension (ladder rung c): the merge as-of join
    extensions.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
