package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches
import graft.sources.TestData

/** Count–Min sketch: exactness at ample width, the one-sided error
  * guarantee under collisions, and the degenerate single-bucket bound. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("ample width: estimates equal exact counts (hand case)") {
    val items = Seq("a", "a", "a", "b", "b", "c").toDF("item")
    val probes = Seq("a", "b", "c", "zzz-absent").toDF("item")
    val r = Sketches.cmsCounts(items, probes, "item", width = 1 << 16, depth = 3)
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "zzz-absent" -> 0L))
  }

  test("width=1 degenerates to the total occurrence count for every probe") {
    val items = Seq("a", "a", "b", "c").toDF("item")
    val probes = Seq("a", "c").toDF("item")
    val r = Sketches.cmsCounts(items, probes, "item", width = 1, depth = 2)
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 4L, "c" -> 4L))
  }

  test("fixture words: est >= exact always; tight at generous width") {
    val docs = TestData(spark, sf0001).documents
    val words = docs.select(explode(split(col("text"), " ")).as("item"))
      .filter(length(col("item")) > 0)
    val exact = words.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val probes = words.distinct()
    def est(width: Int) =
      Sketches.cmsCounts(words, probes, "item", width, depth = 3)
        .as[(String, Long)].collect().toMap
    val wide = est(1 << 16)
    assert(wide.keySet == exact.keySet)
    wide.foreach { case (k, v) => assert(v == exact(k),
      s"'$k': est $v != exact ${exact(k)} at 2^16 buckets for a tiny vocab") }
    val narrow = est(32) // forced collisions
    narrow.foreach { case (k, v) => assert(v >= exact(k),
      s"'$k': est $v under-counts exact ${exact(k)} — CM must never") }
    // determinism under the xxhash production family
    assert(est(32) == narrow)
  }
}
