package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for per-key RECURSIVE smoothers: given the
  * key's full history as `array<double>`, emit the running EWMA series
  * sₜ = α·xₜ + (1−α)·sₜ₋₁ (s₀ = x₀) in ONE pass with ONE output
  * allocation.
  *
  * Why an expression and not `aggregate()`: the higher-order-function
  * fold can only grow its accumulator array via `concat(acc, array(…))`,
  * and Catalyst copies the accumulator on every step — O(n²) element
  * copies per key in history length n (fine for 2,000 bars/symbol,
  * a scale-killer for a 10⁵-event key). This expression is the O(n)
  * formulation with the IDENTICAL IEEE step (`x*α + s*(1−α)`, `1−α`
  * folded once), so results are bit-for-bit the old fold's.
  *
  * Null semantics match the fold it replaces: a null element poisons the
  * state — that element and every later one emit null (the fold's
  * `element_at(acc,-1)` went null and never recovered).
  */
case class EwmaRun(child: Expression, alpha: Double) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val oneMinus = 1.0 - alpha
    // Optimistic PRIMITIVE pass (no boxing, no per-element GC pressure —
    // a 10⁷-event key is GC-bound on Object[]): since the first null
    // poisons every later element, the output is a primitive prefix
    // followed by nulls — box only when a null actually appears.
    val prim = new Array[Double](n)
    var s = 0.0
    var first = true
    var i = 0
    while (i < n && !xs.isNullAt(i)) {
      val x = xs.getDouble(i)
      s = if (first) x else x * alpha + s * oneMinus
      first = false
      prim(i) = s
      i += 1
    }
    if (i == n) new GenericArrayData(prim)
    else {
      val out = new Array[Any](n)
      var j = 0
      while (j < i) { out(j) = prim(j); j += 1 } // computed prefix
      new GenericArrayData(out) // i..n-1 stay null (poisoned)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val prim = ctx.freshName("prim")
      val boxed = ctx.freshName("boxed")
      val first = ctx.freshName("first")
      val a = alpha
      val om = 1.0 - alpha
      s"""
         |int $n = $xs.numElements();
         |double[] $prim = new double[$n];
         |double $s = 0.0;
         |boolean $first = true;
         |int $i = 0;
         |while ($i < $n && !$xs.isNullAt($i)) {
         |  double $x = $xs.getDouble($i);
         |  $s = $first ? $x : ($x * $a + $s * $om);
         |  $first = false;
         |  $prim[$i] = $s;
         |  $i++;
         |}
         |if ($i == $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($prim);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $j = 0; $j < $i; $j++) $boxed[$j] = $prim[$j];
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** O(n) running product over the key's ordered factor array — the exact
  * cumprod's inner pass. IDENTICAL multiply sequence to the window fold it
  * replaces (`aggregate(collect_list(factor).over(unboundedPreceding),
  * 1.0, _*_)`): state starts at 1.0 and multiplies left-to-right, so
  * results are bit-for-bit. Null semantics also match: `collect_list`
  * SKIPPED null factors, so a null element leaves the state untouched and
  * emits the running product so far (a leading null emits 1.0) — nulls
  * are transparent, not poisoning (contrast [[EwmaRun]]).
  */
case class CumProdRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](n)
    var s = 1.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) s = s * xs.getDouble(i)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $xs.numElements();
         |double[] $arr = new double[$n];
         |double $s = 1.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$xs.isNullAt($i)) $s = $s * $xs.getDouble($i);
         |  $arr[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** O(n) running AFFINE composition over the key's ordered event arrays —
  * the adjust-coefficient fold (A,B) ∘ (a,b) = (A·a, B·a + b), state
  * (1.0, 0.0). Emits the running B series; pair with [[CumProdRun]] over
  * the `a` array for the running A (identical multiply sequence). Exactly
  * the IEEE step sequence of the struct-accumulator window fold it
  * replaces. Inputs are the a- and b-arrays of the SAME ordered events.
  *
  * Null contract (ADVICE r13): a null in EITHER array skips that event —
  * the state carries through unchanged and the running value is emitted.
  * This is this expression's DEFINED semantics, not a collect_list replay
  * claim: the r12 struct-fold collected whole structs whose FIELDS could
  * be null, and a null field would have poisoned its state (NaN-spread),
  * so the two formulations agree only on null-free inputs. The one
  * production caller ([[graft.domain.MarketViews.exrightsAB]]) derives
  * a/b from arithmetic on a non-null date (provably null-free — asserted
  * by `ApiSpec`'s exrights non-null contract test); any new caller with
  * genuinely nullable events must pre-filter them and decide skip vs
  * poison explicitly.
  */
case class AffineRunB(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val as = l.asInstanceOf[ArrayData]
    val bs = r.asInstanceOf[ArrayData]
    val n = math.min(as.numElements(), bs.numElements())
    val out = new Array[Double](n)
    var bc = 0.0
    var i = 0
    while (i < n) {
      if (!as.isNullAt(i) && !bs.isNullAt(i))
        bc = bc * as.getDouble(i) + bs.getDouble(i)
      out(i) = bc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (as, bs) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bc = ctx.freshName("bc")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = java.lang.Math.min($as.numElements(), $bs.numElements());
         |double[] $arr = new double[$n];
         |double $bc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$as.isNullAt($i) && !$bs.isNullAt($i))
         |    $bc = $bc * $as.getDouble($i) + $bs.getDouble($i);
         |  $arr[$i] = $bc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** O(n) one-sided CUSUM over the key's ordered deviations — the classic
  * sequential change-point statistic (Page 1954): sₜ = max(0, sₜ₋₁ + xₜ),
  * s₀ = 0, where xₜ is the already-centered deviation (value − target).
  * The clip-at-zero makes the recursion irreducible to any windowed
  * aggregate — same expression-not-fold rationale as [[EwmaRun]]. On
  * integer-valued inputs every state is an exact integer in double, so
  * the series replays bit-for-bit in any engine. Null elements leave the
  * state untouched and emit the running value (collect_list-skip parity,
  * like [[CumProdRun]]).
  */
case class CusumRun(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        s = s + xs.getDouble(i)
        if (s < 0.0) s = 0.0
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $xs.numElements();
         |double[] $arr = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$xs.isNullAt($i)) {
         |    $s = $s + $xs.getDouble($i);
         |    if ($s < 0.0) $s = 0.0;
         |  }
         |  $arr[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** O(n) TOKEN-BUCKET replay over a key's ordered (timestamp-ms,
  * cost-mtoken) arrays — the rate-limit audit every quota/throttle system
  * needs replayed offline: the bucket starts FULL at `capMt` milli-tokens,
  * refills `refillPerMs` mtokens per elapsed ms (clamped at `capMt`), and
  * an event is ALLOWED iff the refilled level covers its cost (allowed
  * events drain, denied leave the level untouched — strict policing).
  *
  * All-integer arithmetic (milli-token granularity), so the recursion is
  * SQL-exact. Output packs (tokens_after << 1 | allowed) into one long per
  * event — one pass, one allocation; callers unpack with bit ops. Null
  * elements (either array) are skipped: state carries, packed output has
  * allowed = 0 and the carried level (fixtures are null-free; the
  * contract mirrors [[AffineRunB]]'s skip rule). First event sees a full
  * bucket (no refill needed, none applied). */
case class TokenBucketRun(left: Expression, right: Expression,
                          capMt: Long, refillPerMs: Long)
  extends BinaryExpression {

  // Saturation bound (ADVICE r14): `s + gap·refill` can overflow Long for
  // large timestamp gaps before the min-clamp, silently going negative.
  // The fix clamps the gap to the refill that already fills the bucket —
  // semantically identical (the unclamped value would min-clamp to capMt
  // anyway) and overflow-free as long as capMt + refillPerMs fits, which
  // this require guarantees with headroom.
  require(refillPerMs > 0 && capMt > 0 &&
    capMt <= Long.MaxValue / 4 && refillPerMs <= Long.MaxValue / 4,
    s"degenerate token-bucket parameters (cap=$capMt, refill=$refillPerMs)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val ts = l.asInstanceOf[ArrayData]
    val cs = r.asInstanceOf[ArrayData]
    val n = math.min(ts.numElements(), cs.numElements())
    val out = new Array[Long](n)
    var s = capMt
    var tPrev = Long.MinValue
    var i = 0
    while (i < n) {
      if (ts.isNullAt(i) || cs.isNullAt(i)) out(i) = s << 1
      else {
        val t = ts.getLong(i)
        if (tPrev != Long.MinValue && t > tPrev) {
          // clamp the gap to "enough to fill" BEFORE multiplying: identical
          // result (min would land on capMt anyway), no Long overflow
          val gap = math.min(t - tPrev, (capMt - s) / refillPerMs + 1L)
          s = math.min(capMt, s + gap * refillPerMs)
        }
        tPrev = t
        val cost = cs.getLong(i)
        if (s >= cost) { s -= cost; out(i) = (s << 1) | 1L }
        else out(i) = s << 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ts, cs) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val tp = ctx.freshName("tp")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = java.lang.Math.min($ts.numElements(), $cs.numElements());
         |long[] $arr = new long[$n];
         |long $s = ${capMt}L;
         |long $tp = java.lang.Long.MIN_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($ts.isNullAt($i) || $cs.isNullAt($i)) { $arr[$i] = $s << 1; }
         |  else {
         |    long $t = $ts.getLong($i);
         |    if ($tp != java.lang.Long.MIN_VALUE && $t > $tp) {
         |      long ${t}g = java.lang.Math.min($t - $tp,
         |        (${capMt}L - $s) / ${refillPerMs}L + 1L);
         |      $s = java.lang.Math.min(${capMt}L, $s + ${t}g * ${refillPerMs}L);
         |    }
         |    $tp = $t;
         |    long $c = $cs.getLong($i);
         |    if ($s >= $c) { $s -= $c; $arr[$i] = ($s << 1) | 1L; }
         |    else $arr[$i] = $s << 1;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SeqFoldExpressions {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column wrapper for [[EwmaRun]]. */
  def ewmaRun(xs: Column, alpha: Double): Column =
    ColumnBridge.column(EwmaRun(ColumnBridge.expression(xs), alpha))

  /** Column wrapper for [[CumProdRun]]. */
  def cumProdRun(xs: Column): Column =
    ColumnBridge.column(CumProdRun(ColumnBridge.expression(xs)))

  /** Column wrapper for [[AffineRunB]]. */
  def affineRunB(as: Column, bs: Column): Column =
    ColumnBridge.column(
      AffineRunB(ColumnBridge.expression(as), ColumnBridge.expression(bs)))

  /** Column wrapper for [[CusumRun]]. */
  def cusumRun(xs: Column): Column =
    ColumnBridge.column(CusumRun(ColumnBridge.expression(xs)))

  /** Column wrapper for [[TokenBucketRun]]. */
  def tokenBucketRun(ts: Column, costs: Column, capMt: Long,
                     refillPerMs: Long): Column =
    ColumnBridge.column(TokenBucketRun(ColumnBridge.expression(ts),
      ColumnBridge.expression(costs), capMt, refillPerMs))
}
