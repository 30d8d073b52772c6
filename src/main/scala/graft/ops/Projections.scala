package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / reshaping operators (SURVEY.md §2.2 P1–P3, F6). */
object Projections {

  /** P1 — field-list projection with passthrough extras: `fields ∪ extra`,
    * keeping only columns that exist (ptrade_data_api.py:94-100). */
  def projectExisting(df: DataFrame, fields: Seq[String], extra: Seq[String] = Nil): DataFrame = {
    val want = (fields ++ extra).distinct.filter(df.columns.contains)
    df.select(want.map(col): _*)
  }

  /** P3 — rename normalization from a map, ignoring absent columns
    * (data_splitter.py:17-42 rename maps; `amount→money` et al.). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.filter { case (from, _) => df.columns.contains(from) }
      .foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** P2 — routed split-projection: one wide cached scan fanned out into named
    * column subsets, each with its own rename map (DataSplitter.split_data,
    * data_splitter.py:17-121). The caller decides caching; at scale the wide
    * scan is read once and the three sinks share it (SURVEY.md §4 row 1).
    */
  def routedSplit(wide: DataFrame,
                  routes: Map[String, (Seq[String], Map[String, String])]): Map[String, DataFrame] =
    routes.map { case (name, (cols, renames)) =>
      name -> renameAll(projectExisting(wide, cols), renames)
    }

  /** F6 — column reorder/ensure: select the exact target column list, adding
    * missing ones as typed nulls (pandas `reindex(columns=...)`,
    * data_converter.py:105-106). */
  def reindexColumns(df: DataFrame, cols: Seq[String], dataType: String = "double"): DataFrame =
    df.select(cols.map { c =>
      if (df.columns.contains(c)) col(c) else lit(null).cast(dataType).as(c)
    }: _*)
}
