package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.sources.TestData

/** Deterministic sampling: partitioning independence, nested rates,
  * stratified thresholds, reproducible shuffle order. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = TestData(spark, sf0001).documents

  test("membership is independent of partitioning (retry/cluster-layout safe)") {
    val a = Sampling.bernoulli(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(13), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("rates nest: the 10% sample is a subset of the 30% sample") {
    val s10 = Sampling.bernoulli(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s30 = Sampling.bernoulli(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s10.subsetOf(s30))
  }

  test("stratified: per-stratum rates honored within binomial noise") {
    val out = Sampling.stratified(docs, "doc_id", "lang",
      Map("en" -> 0.8, "de" -> 0.2), defaultRate = 0.0)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.keySet.exists(l => l != "en" && l != "de"), s"default 0 leaked: $byLang")
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val deRate = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(enRate > 0.6 && enRate < 0.95, s"en rate $enRate")
    assert(deRate > 0.05 && deRate < 0.4, s"de rate $deRate")
  }

  test("capPerGroup: absolute per-group bound, deterministic, rate-composable") {
    val capped = Sampling.capPerGroup(docs.select(col("doc_id"), col("source")),
      "source", "doc_id", cap = 7)
    val perGroup = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(perGroup.nonEmpty && perGroup.forall(_._2 <= 7))
    // groups smaller than the cap keep everything
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    perGroup.foreach { case (s, n) => assert(n == math.min(7L, sizes(s))) }
    // deterministic: same kept set on re-run and after a repartition
    val ids = capped.select("doc_id").as[Long].collect().toSet
    val again = Sampling.capPerGroup(docs.repartition(13)
        .select(col("doc_id"), col("source")), "source", "doc_id", cap = 7)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == again)
    // hash-order composition: the cap-5 set nests inside the cap-7 set
    val tighter = Sampling.capPerGroup(docs.select(col("doc_id"), col("source")),
        "source", "doc_id", cap = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(tighter.subsetOf(ids))
  }

  test("leakageSafeSplit: near-dup pairs never straddle splits; singletons match split()") {
    // hand-built pair graph: {1,2,3} chained, {10,11} paired, rest singleton
    val docIds = (1L to 20L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Sampling.leakageSafeSplit(docIds, "doc_id", pairs,
      "doc_a", "doc_b", 0.6, 0.2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // every pair member shares its partner's component AND split
    assert(out(1L) == out(2L) && out(2L) == out(3L), "chain must be one cluster")
    assert(out(10L) == out(11L), "pair must share a split")
    assert(out(1L)._1 == 1L && out(10L)._1 == 10L, "component = min member id")
    // docs in no pair are their own component and match the plain split
    val plain = Sampling.split((4L to 9L).toDF("doc_id"), "doc_id", 0.6, 0.2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (4L to 9L).foreach { d =>
      assert(out(d)._1 == d, s"singleton $d must be its own component")
      assert(out(d)._2 == plain(d), s"singleton $d must match split()")
    }
    // assignment is partitioning-independent (the bernoulli discipline)
    val out2 = Sampling.leakageSafeSplit(docIds.repartition(7), "doc_id",
      pairs, "doc_a", "doc_b", 0.6, 0.2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out == out2)
  }

  test("deterministicShuffle: identical order across runs, seed changes it") {
    val o1 = Sampling.deterministicShuffle(docs, "doc_id", 42L)
      .select("doc_id").as[Long].collect().toSeq
    val o2 = Sampling.deterministicShuffle(docs.repartition(7), "doc_id", 42L)
      .select("doc_id").as[Long].collect().toSeq
    assert(o1 === o2)
    val o3 = Sampling.deterministicShuffle(docs, "doc_id", 43L)
      .select("doc_id").as[Long].collect().toSeq
    assert(o1 !== o3)
    assert(o1.sorted === o3.sorted)
  }

  test("weighted: zero never keeps, wMax ≡ bernoulli, weights and rates nest") {
    val docs = graft.sources.TestData(spark, sf0001).documents
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").as[Long].collect().toSet
    // weight 0 -> empty; weight = wMax at rate r ≡ uniform bernoulli(r)
    assert(Sampling.weighted(docs, "doc_id", lit(0L), 100L, 0.9).count() == 0)
    assert(ids(Sampling.weighted(docs, "doc_id", lit(100L), 100L, 0.4)) ==
      ids(Sampling.bernoulli(docs, "doc_id", 0.4)))
    // a row kept at weight w is kept at any w' >= w (same key, same rate)
    val low = ids(Sampling.weighted(docs, "doc_id", col("n_chars") / 2, 400L, 0.5))
    val high = ids(Sampling.weighted(docs, "doc_id", col("n_chars"), 400L, 0.5))
    assert(low.subsetOf(high), s"${low.size} vs ${high.size}")
    // rates nest too
    val r3 = ids(Sampling.weighted(docs, "doc_id", col("n_chars"), 400L, 0.3))
    val r6 = ids(Sampling.weighted(docs, "doc_id", col("n_chars"), 400L, 0.6))
    assert(r3.subsetOf(r6) && r3.size < r6.size)
  }
}
