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

  test("measured reducer-load caps: salted/split treatments flatten a 30% hot key") {
    // tools/SkewProbe at spec scale — the PERF claim of saltedJoin /
    // skewSplitJoin (per-reducer load cap), measured on real shuffles, not
    // modeled. Deterministic: content-derived salts, no rand().
    import graft.tools.SkewProbe
    val n = 400000L; val nPart = 16; val ideal = n.toDouble / nPart
    val large = SkewProbe.skewedLarge(spark, n, nKeys = 200, hotShare = 0.30)
      .localCheckpoint()
    val plainMax = SkewProbe.partitionLoads(large, nPart, Seq("k")).max
    assert(plainMax >= (0.30 * n).toLong, // untreated: hot key → ONE reducer
      s"hot reducer got $plainMax rows, expected the whole 30% hot mass")
    val saltedDf = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(64L)))
    val saltedMax = SkewProbe.partitionLoads(saltedDf, nPart, Seq("k", "__salt")).max
    assert(saltedMax <= (2.0 * ideal).toLong,
      s"salted max reducer load $saltedMax exceeds 2x ideal ($ideal)")
    assert(saltedMax < plainMax / 2, "salting should at least halve the hot reducer")
    val hot = Joins.hotKeys(large, Seq("k"), (ideal * 2).toLong)
    val tail = large.join(broadcast(hot), Seq("k"), "left_anti").localCheckpoint()
    val hotMass = n - tail.count()
    assert(hotMass >= (0.30 * n).toLong, "hot-key detection missed the hot mass")
    val tailMax = SkewProbe.partitionLoads(tail, nPart, Seq("k")).max
    assert(tailMax <= (2.0 * ideal).toLong,
      s"split-join tail max reducer load $tailMax exceeds 2x ideal ($ideal)")
  }

  test("binnedRangeJoin: result ≡ naive BETWEEN join; pairs meet exactly once") {
    // intervals deliberately span 0, 1, 2 and 3 bins at bin=10; points sit
    // on bin edges, interval endpoints (inclusive both ends), and gaps
    val pts = Seq(0L, 5L, 9L, 10L, 15L, 20L, 29L, 30L, 42L, 55L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val ivs = Seq((100L, 0L, 0L), (101L, 5L, 9L), (102L, 8L, 12L),
      (103L, 10L, 39L), (104L, 41L, 43L), (105L, 56L, 60L))
      .toDF("iid", "lo", "hi")
    val naive = pts.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    for (bin <- Seq(1L, 7L, 10L, 100L)) {
      val binned = Joins.binnedRangeJoin(pts, ivs, "p", "lo", "hi", bin)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(binned === naive, s"bin=$bin diverged from the BETWEEN join")
      // `===` on sorted seqs already proves no duplicate pair, but assert
      // the multiset property explicitly for the multi-bin interval
      assert(binned.distinct.size == binned.size, s"bin=$bin duplicated pairs")
    }
  }
}
