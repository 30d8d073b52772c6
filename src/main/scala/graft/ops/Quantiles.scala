package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quantiles.
  *
  * [[exactDisc]] is the nearest-rank (`percentile_disc`) definition: the
  * value at rank ⌈p·n⌉ in ascending order. It SELECTS an input value (no
  * interpolation arithmetic), so the result is exact in any engine — the
  * oracle-compared form. Rows with equal values are interchangeable at a
  * given rank, so ordering by value alone is deterministic.
  *
  * [[approx]] is the 100 TB scale path: `approx_percentile` (a mergeable
  * t-digest-style sketch — one map-side pass, constant state per group, no
  * sort). Use it when an ε-approximate answer is acceptable; the exact
  * variant costs a full per-group sort (window rank), which is the real
  * price of exactness at scale.
  */
object Quantiles {

  /** Exact nearest-rank quantiles per group.
    * Returns (group, n, p&lt;100·p&gt;…) — one row per group. */
  def exactDisc(df: DataFrame, group: String, value: String,
                ps: Seq[Double]): DataFrame = {
    val ranked = df.select(col(group), col(value))
      .withColumn("rn", row_number().over(
        Window.partitionBy(group).orderBy(col(value).asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(group)).cast("long"))
    val picks = ps.map { p =>
      max(when(col("rn") === ceil(col("n").cast("double") * lit(p)), col(value)))
        .as(s"p${(p * 100).round}")
    }
    ranked.groupBy(group).agg(max(col("n")).as("n"), picks: _*)
  }

  /** Sketch-based quantiles — the scale path (not oracle-comparable). */
  def approx(df: DataFrame, group: String, value: String,
             ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(group).agg(
      count(lit(1)).as("n"),
      approx_percentile(col(value), array(ps.map(lit): _*), lit(accuracy)).as("qs"))
}
