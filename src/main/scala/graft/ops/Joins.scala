package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-family operators (SURVEY.md §2.3 J1–J6). */
object Joins {

  /** J6 — as-of join: for each left row, attach the single right row with the
    * greatest `rightTime` such that `rightTime <= leftTime`, within equal
    * join keys. Reference semantics: `get_fundamentals(date=...)` returns the
    * latest report published on or before the query date
    * (PTrade_API_mini_Reference.md:3316,3379-3394).
    *
    * Implementation: union the two sides tagged, sort within (key, time) and
    * forward-fill the right payload — ONE shuffle on the key, no range
    * explosion. This is the scalable plan: a naive `left.join(right,
    * leftTime >= rightTime)` + row_number would be O(|L|·|R|/key) and blow up
    * at 100 TB; the tagged-union plan is O(|L|+|R|) with a single sort.
    *
    * `rightCols` are the payload columns carried from the right side; they
    * must not collide with left column names.
    *
    * Determinism contract: `rightTime` must be unique per key — two right
    * rows at the same (key, time) would be ordered arbitrarily within the
    * fill window. All engine uses satisfy this (event ns-timestamps,
    * monthly factor dates, quarterly publication dates).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct (non-null for every right row,
    // even when individual payload fields are null) so the forward fill
    // distinguishes "no right row yet" from "right row with a null value" —
    // filling the fields individually would skip legitimate nulls.
    // Tag: right rows sort before left rows at the same timestamp so a right
    // row with rightTime == leftTime is visible to that left row (<=).
    val taggedLeft = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__payload", lit(null))
    val taggedRight = leftCols.filterNot(keys.contains).foldLeft(
      right.withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
        .withColumn("__payload", struct(rightCols.map(col): _*))
    )((d, c) => d.withColumn(c, lit(null)))
    val cols = keys ++ Seq("__t", "__side") ++ leftCols.filterNot(keys.contains) :+ "__payload"
    val unioned = taggedLeft.select(cols.map(col): _*)
      .unionByName(taggedRight.select(cols.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__payload",
      last(col("__payload"), ignoreNulls = true).over(w))
    val extracted = rightCols.foldLeft(filled) { (d, c) =>
      d.withColumn(c, col("__payload").getField(c))
    }
    extracted.filter(col("__side") === 1).drop("__t", "__side", "__payload")
  }

  /** J3 — broadcast lookup with default: left join a small dimension and
    * coalesce the looked-up flag to a default
    * (ptrade_data_api.py:339-358 HALT map with False default). */
  def broadcastLookup(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                      flag: String, default: Column): DataFrame =
    facts.join(broadcast(dim), keys, "left")
      .withColumn(flag, coalesce(col(flag), default))

  /** J4/J5 — upsert (last-wins dedup-merge): existing ∪ incoming, keep the
    * preferred row per key. `prefer` columns rank rows descending (e.g. a
    * batch-id or load timestamp); ties broken by column order.
    * Reference: download_efficient.py:324-335 (`drop_duplicates(keep='last')`).
    * On a cluster this is Delta `MERGE INTO`; the window rewrite keeps the
    * build self-contained. One shuffle on the key.
    */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             prefer: Seq[Column]): DataFrame = {
    val unioned = existing.withColumn("__src", lit(0))
      .unionByName(incoming.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((prefer :+ col("__src")).map(_.desc): _*)
    unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }
}
