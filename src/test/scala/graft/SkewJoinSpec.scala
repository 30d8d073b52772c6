package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins

/** Skew-treatment joins: result equivalence with the plain join on skewed
  * input, salt spreading, hot-key detection. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows of one hot key + a 100-key tail, joined to a 101-row dim
  private lazy val facts = ((1 to 1000).map(i => (7L, i)) ++
    (1 to 100).map(i => (i.toLong + 100L, i))).toDF("k", "v")
  private lazy val dim = ((Seq(7L) ++ (1 to 100).map(_.toLong + 100L))
    .zipWithIndex.map { case (k, i) => (k, s"d$i") }).toDF("k", "name")

  private def plain = facts.join(dim, Seq("k"), "inner")
    .select("k", "v", "name").as[(Long, Int, String)].collect().sorted

  test("saltedJoin: identical result to the plain join on skewed keys") {
    val salted = Joins.saltedJoin(facts, dim, Seq("k"), salts = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin left: unmatched large rows survive exactly once") {
    val factsExtra = facts.union(Seq((9999L, -1)).toDF("k", "v"))
    val out = Joins.saltedJoin(factsExtra, dim, Seq("k"), salts = 4, "left")
      .filter($"k" === 9999L).select("name").collect()
    assert(out.length === 1 && out.head.isNullAt(0))
  }

  test("saltedJoin: the hot key actually spreads across salts") {
    val spread = facts.withColumn("__salt",
        pmod(xxhash64(facts.columns.map(col): _*), lit(8L)))
      .filter($"k" === 7L).select("__salt").distinct().count()
    assert(spread >= 4, s"hot key landed in only $spread of 8 salt buckets")
  }

  test("saltedJoin rejects non-equivalent join types") {
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(facts, dim, Seq("k"), 4, "full_outer")
    }
  }

  test("hotKeys + skewSplitJoin: same result as the plain join") {
    val hot = Joins.hotKeys(facts, Seq("k"), minCount = 500L)
    assert(hot.as[Long].collect().toSeq === Seq(7L))
    val out = Joins.skewSplitJoin(facts, dim, Seq("k"), hot)
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted
    assert(out.toSeq === plain.toSeq)
  }

  test("property: salted and split joins match the plain join on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    // small key space forces collisions, dup keys on BOTH sides force
    // multi-row match groups (the case where a buggy salt loses pairs)
    val rows = Gen.listOfN(300, Gen.zip(Gen.choose(0L, 20L), Gen.choose(-100, 100)))
    (0 until 3).foreach { it =>
      val f = sample(rows, 11L + it).toDF("k", "v")
      val d = sample(rows, 97L + it).map { case (k, v) => (k, s"n$v") }.toDF("k", "name")
      val expect = f.join(d, Seq("k"), "inner")
        .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
      val viaSalt = Joins.saltedJoin(f, d, Seq("k"), salts = 5)
        .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
      assert(viaSalt === expect, s"saltedJoin diverged (iteration $it)")
      val viaSplit = Joins.skewSplitJoin(f, d, Seq("k"),
          Joins.hotKeys(f, Seq("k"), minCount = 10L))
        .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
      assert(viaSplit === expect, s"skewSplitJoin diverged (iteration $it)")
    }
  }
}
