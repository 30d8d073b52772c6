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

  test("hllBoundCheck: exact counts carried, sketch inside tolerance") {
    // 3 groups with known cardinalities spanning the HLL++ sparse and
    // dense regimes (42 / 1000 / 20000 distinct values)
    val df = spark.range(42).select(lit("s").as("g"), col("id").as("v"))
      .union(spark.range(1000).select(lit("m").as("g"), col("id").as("v")))
      .union(spark.range(20000).select(lit("l").as("g"), col("id").as("v")))
      .union(spark.range(500).select(lit("m").as("g"), col("id").as("v"))) // dups
    val r = Sketches.hllBoundCheck(df, Seq("g"), "v")
      .as[(String, Long, Boolean)].collect()
      .map { case (k, n, b) => k -> ((n, b)) }.toMap
    assert(r("s") == ((42L, true)) && r("m") == ((1000L, true)) &&
      r("l") == ((20000L, true)))
    // a deliberately hostile tolerance flags the bound column, proving the
    // check can actually fail (the gate's TRUE oracle is falsifiable)
    val tight = Sketches.hllBoundCheck(df.filter(col("g") === "l"), Seq("g"), "v",
      rsd = 0.04, tol = 1e-6)
    val (_, n, ok) = tight.as[(String, Long, Boolean)].collect().head
    assert(n == 20000L && !ok, "1e-6 relative tolerance should not be met at 20k")
  }

  test("heavyHitters: never a false negative; narrow width admits false positives") {
    // 'a' x60, 'b' x30, c..z x1 each: N=114, phi=1/4 -> true heavies {a, b}?
    // threshold N/4 = 28.5 -> a (60) and b (30) heavy, singles not
    val items = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      ('c' to 'z').map(_.toString)).toDF("w")
    val wide = Sketches.heavyHitters(items, "w", width = 1024, depth = 3,
        phiNum = 1, phiDen = 4, family = graft.dedup.Dedup.Md5Hash)
      .as[(String, Long, Long, Boolean)].collect()
    // no false negatives: every exact-heavy item is in the est-heavy output
    assert(wide.filter(_._4).map(_._1).toSet == Set("a", "b"), wide.toSeq.toString)
    // one-sided: est >= exact on every emitted row
    assert(wide.forall(r => r._2 >= r._3))
    // width=1: every item estimates to N -> ALL items emit, singles are
    // the false positives the one-sided bound permits
    val narrow = Sketches.heavyHitters(items, "w", width = 1, depth = 3,
        phiNum = 1, phiDen = 4, family = graft.dedup.Dedup.Md5Hash)
      .as[(String, Long, Long, Boolean)].collect()
    assert(narrow.length == 26, "width 1 collapses every item onto one counter")
    assert(narrow.count(!_._4) == 24, "24 false positives, zero false negatives")
    assert(narrow.filter(_._4).map(_._1).toSet == Set("a", "b"))
  }
}
