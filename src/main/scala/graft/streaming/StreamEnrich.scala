package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — attach a slowly-changing dimension to an
  * unbounded event stream.
  *
  * This is the STATELESS member of the streaming-join family (next to
  * [[StreamJoin]]'s stateful stream-stream variants): each micro-batch
  * hash-joins against the current dimension snapshot, so there is no state
  * store, no watermark requirement, and nothing to expire. At 100 TB/day
  * the dim side stays broadcast-sized (customer/instrument/tier tables are
  * millions of rows, not billions) while the stream side never shuffles —
  * the per-batch plan is scan → broadcast hash join → sink. Because the
  * static side is re-planned per micro-batch, a dimension update lands at
  * the next batch boundary without restarting the query.
  */
object StreamEnrich {

  /** Left-join `dim` onto `stream` on `keys`, broadcast, then fill each
    * column in `defaults` for stream rows with no dimension match (the
    * unknown-member convention — an event must never be dropped just
    * because its dimension row hasn't arrived yet). */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
             defaults: Map[String, Column] = Map.empty): DataFrame = {
    val joined = stream.join(broadcast(dim), keys, "left")
    defaults.foldLeft(joined) { case (d, (c, dflt)) =>
      d.withColumn(c, coalesce(col(c), dflt))
    }
  }
}
