package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Compiled kernel for the two-level (hierarchical) IVF coarse assignment —
  * the r15 verdict's "codegen the argmin" item. The higher-order-function
  * formulation of `Ann.hierarchicalAssign` evaluates its two argmin stages
  * interpreted (`transform`/`array_sort` are CodegenFallback), a ~4×
  * per-comparison constant that ceded the nLists < 256 regime to the flat
  * crossJoin+window assignment (docs/ASSIGN_r15.json). This kernel runs both
  * stages as tight JVM loops inside whole-stage codegen, so the two-level
  * assignment wins at EVERY nLists: small indexes skip the window exchange,
  * large ones keep the O(√nLists·(1+topProbe)) pruning.
  *
  * Bit-identity contract (spec-pinned in PqSpec): scoring is
  * `-(dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))))` with the dot accumulated
  * left-to-right in double over float elements — the exact IEEE sequence of
  * [[VecDotFloat]]/`Ann.cosine` — and selection orders by (d ASC, id ASC)
  * using `java.lang.Double.compare` (Spark's NaN-last double ordering). The
  * per-vector norms are hoisted (computed once, not once per comparison);
  * hoisting a deterministic subexpression cannot change its bits.
  *
  * The centroid artifacts live in the kernel object (driver-built from the
  * broadcast-sized centroid table, shipped to executors via the expression's
  * reference-object slot — the task-binary broadcast, same transport the
  * one-row-aggregate HOF formulation used).
  */
final class HierArgMinKernel(
    topIds: Array[Long],
    topVecs: Array[Array[Float]],
    kidIds: Array[Array[Long]],            // children per top, (d, id)-owned
    kidVecs: Array[Array[Array[Float]]],
    topProbe: Int,
    m: Int) extends Serializable {

  require(topIds.length == topVecs.length && topIds.length == kidIds.length &&
    topIds.length == kidVecs.length, "ragged kernel artifacts")
  require(topProbe >= 1 && m >= 1, "degenerate hierarchical-assign parameters")

  // sqrt(dot(v,v)) per stored vector, hoisted once at construction
  private val topNorm: Array[Double] = topVecs.map(selfNorm)
  private val kidNorm: Array[Array[Double]] = kidVecs.map(_.map(selfNorm))

  private def selfNorm(v: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(acc)
  }

  // dot(row, stored) — the VecDotFloat sequence: min-length, float→double,
  // left-to-right accumulation
  private def dot(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  // (d1, id1) < (d2, id2) under Spark's double ordering (NaN last, then id)
  @inline private def lt(d1: Double, id1: Long, d2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(d1, d2)
    c < 0 || (c == 0 && id1 < id2)
  }

  /** [[apply]] behind a null-element scan: a null element would read as
    * garbage through `ArrayData.getFloat` (ADVICE r16) — yield null
    * instead (the consumer's posexplode drops the row). */
  def applyChecked(v: ArrayData): ArrayData = {
    var i = 0
    val n = v.numElements()
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    apply(v)
  }

  /** m nearest centroid ids for one row vector, in (d ASC, id ASC) order.
    * Called from generated code — must stay allocation-light. */
  def apply(v: ArrayData): ArrayData = {
    val rowNorm = {
      val n = v.numElements()
      var acc = 0.0; var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * v.getFloat(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    // stage 1: the topProbe nearest TOP centroids (sorted insertion, cap p)
    val nTop = topIds.length
    val p = math.min(topProbe, nTop)
    val selD = new Array[Double](p)
    val selT = new Array[Int](p)
    var selN = 0
    var t = 0
    while (t < nTop) {
      val d = -(dot(v, topVecs(t)) / (rowNorm * topNorm(t)))
      val id = topIds(t)
      if (selN < p || lt(d, id, selD(selN - 1), topIds(selT(selN - 1)))) {
        var i = if (selN < p) selN else p - 1
        while (i > 0 && lt(d, id, selD(i - 1), topIds(selT(i - 1)))) {
          selD(i) = selD(i - 1); selT(i) = selT(i - 1); i -= 1
        }
        selD(i) = d; selT(i) = t
        if (selN < p) selN += 1
      }
      t += 1
    }
    // stage 2: m nearest over the probed tops' children (same order rule)
    val bd = new Array[Double](m)
    val bid = new Array[Long](m)
    var bn = 0
    var s = 0
    while (s < selN) {
      val ti = selT(s)
      val ids = kidIds(ti); val vecs = kidVecs(ti); val nrms = kidNorm(ti)
      var j = 0
      while (j < ids.length) {
        val d = -(dot(v, vecs(j)) / (rowNorm * nrms(j)))
        val id = ids(j)
        if (bn < m || lt(d, id, bd(bn - 1), bid(bn - 1))) {
          var i = if (bn < m) bn else m - 1
          while (i > 0 && lt(d, id, bd(i - 1), bid(i - 1))) {
            bd(i) = bd(i - 1); bid(i) = bid(i - 1); i -= 1
          }
          bd(i) = d; bid(i) = id
          if (bn < m) bn += 1
        }
        j += 1
      }
      s += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bid, bn))
  }
}

/** `array<float>` → `array<long>`: the row's `m` nearest centroid ids via
  * [[HierArgMinKernel]]. Null input → null (the consumer's posexplode drops
  * the row, matching the HOF lane's terminal behavior). Input type is
  * ENFORCED at analysis (ADVICE r16: an `array<double>` child would
  * otherwise be read via `ArrayData.getFloat` — silent garbage distances);
  * a null ELEMENT also yields null instead of reading garbage. */
case class HierArgMinFloat(child: Expression, kernel: HierArgMinKernel)
  extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"HierArgMin requires array<float> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null even for a non-null child: a null ELEMENT nulls the result
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    kernel.applyChecked(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("hierArgMinKernel", kernel,
      classOf[HierArgMinKernel].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $k.applyChecked($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HierArgMin {
  import org.apache.spark.sql.graftshim.ColumnBridge

  def apply(vec: Column, kernel: HierArgMinKernel): Column =
    ColumnBridge.column(HierArgMinFloat(ColumnBridge.expression(vec), kernel))
}
