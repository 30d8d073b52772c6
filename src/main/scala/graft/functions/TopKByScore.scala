package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k selection as a PARTIAL-AGGREGATING aggregate —
  * the guide §2.3 fix for the `row_number() OVER (PARTITION BY g ORDER BY
  * score DESC, id ASC) <= k` pattern on LARGE candidate sets: the window
  * formulation shuffles and SORTS every candidate row (the NSW edge build
  * generates Σ_cell |cell|² ≈ 25M candidate pairs at sf0.1 — two full
  * exchanges of them), while this aggregate reduces each map partition to
  * at most k entries per group before anything moves, so the exchange
  * carries ~groups×k rows.
  *
  * Selection rule is EXACTLY the window's total order: (score DESC via
  * `java.lang.Double.compare`, then id ASC) — the ladder's universal
  * (round6-cosine, id) tie rule, the same comparator `AnnServe.mergeTopK`
  * replays. Output is the selected entries as `array<struct<dst, score>>`
  * in selection order; consumers explode it, and row ORDER of the exploded
  * set matches the window lane's as a set (the driver canonicalizes row
  * order). Null scores/ids never arrive from the callers (round6 of real
  * cosines); a defensive skip keeps them out of the buffer (the window
  * would have ranked NULL score last — past k for any real candidate set).
  */
final class TopKBuf(val k: Int) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  @inline private def before(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(id: Long, s: Double): Unit = {
    if (n < k || before(s, id, scores(n - 1), ids(n - 1))) {
      var i = if (n < k) n else k - 1
      while (i > 0 && before(s, id, scores(i - 1), ids(i - 1))) {
        scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
      }
      scores(i) = s; ids(i) = id
      if (n < k) n += 1
    }
  }

  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.scores(i)); i += 1 }
  }
}

case class TopKByScore(dst: Expression, score: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k >= 1, "degenerate top-k bound")

  override def children: Seq[Expression] = Seq(dst, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("dst", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val d = dst.eval(input)
    val s = score.eval(input)
    if (d != null && s != null)
      b.insert(d.asInstanceOf[Long], s.asInstanceOf[Double])
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = { b.mergeFrom(o); b }

  override def eval(b: TopKBuf): Any = {
    val out = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      out(i) = new GenericInternalRow(Array[Any](b.ids(i), b.scores(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
    bb.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)).putDouble(b.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val bk = bb.getInt()
    val n = bb.getInt()
    val b = new TopKBuf(bk)
    var i = 0
    while (i < n) { b.insert(bb.getLong(), bb.getDouble()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(dst = newChildren(0), score = newChildren(1))
}

object TopKByScore {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** `array<struct<dst, score>>` of the group's top-k by
    * (score DESC, dst ASC). */
  def topK(dst: Column, score: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(dst), ColumnBridge.expression(score), k)
        .toAggregateExpression())
}
