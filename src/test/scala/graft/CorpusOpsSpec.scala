package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.quality.{DataQuality, Decontam, LangModel}
import graft.sources.TestData

/** Corpus-pipeline operators: decontamination overlap, repetition signals,
  * token-budget mixture sampling — hand-built frames with known answers. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontam: bench docs are fully contaminated, disjoint docs are clean") {
    val corpus = Seq(
      (1L, "a b c d e f"),          // shares the bench doc's grams partially
      (2L, "a b c d e"),            // IS the bench doc → 100%
      (3L, "p q r s t u v")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b c d e")).toDF("doc_id", "text")
    val r = Decontam.ngramOverlap(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id", "n_grams", "n_contaminated")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 1 has grams {a b c d e, b c d e f} — 1 hit; doc 2: 1/1; doc 3: 0/3
    assert(r.toSeq === Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 3L, 0L)))
  }

  test("decontam: repeated grams inside a doc count once (distinct grams)") {
    val corpus = Seq((1L, "x y x y x y x y")).toDF("doc_id", "text") // 7 bigrams, 2 distinct
    val bench = Seq((9L, "x y")).toDF("doc_id", "text")
    val r = Decontam.ngramOverlap(corpus, bench, "doc_id", "text", n = 2)
      .select("n_grams", "n_contaminated").as[(Long, Long)].head()
    assert(r === ((2L, 1L)))
  }

  test("bloom decontam: no false negatives vs exact; FP rate bounded") {
    val docs = TestData(spark, sf0001).documents
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val exact = Decontam.ngramOverlap(docs, bench, "doc_id", "text", n = 5)
      .select("doc_id", "n_grams", "n_contaminated")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val bloom = Decontam.bloomDecontam(docs, bench, "doc_id", "text", n = 5,
        mBits = 1 << 18, kHashes = 3)
      .select("doc_id", "n_grams", "n_flagged")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(bloom.keySet == exact.keySet)
    var extra = 0L; var total = 0L
    exact.foreach { case (id, (nG, nC)) =>
      val (bG, bF) = bloom(id)
      assert(bG == nG, s"doc $id gram count")
      assert(bF >= nC, s"doc $id: bloom flagged $bF < exact $nC — false negative!")
      extra += bF - nC; total += nG
    }
    // 2^18 bits / 3 hashes vs the sf0.001 bench gram set → FP well under 1%
    assert(extra.toDouble / total < 0.01,
      s"FP rate ${extra.toDouble / total} too high for mBits=2^18")
    // Md5Hash family: same one-sided-error semantics, replayable lanes
    val md5 = Decontam.bloomDecontam(docs, bench, "doc_id", "text", n = 5,
        mBits = 1 << 18, kHashes = 3, family = graft.dedup.Dedup.Md5Hash)
      .select("doc_id", "n_flagged").as[(Long, Long)].collect().toMap
    exact.foreach { case (id, (_, nC)) => assert(md5(id) >= nC) }
  }

  test("semantic decontam: verbatim + paraphrase flagged, orthogonal clean") {
    // the n-gram lanes can't see a PARAPHRASE (no shared shingles); the
    // embedding lane must — modeled here as a scaled copy (cosine exactly
    // 1 with the bench vector, different "text")
    val bench = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // bench item itself: flagged
      (1L, Array(3.0f, 0.0f, 0.0f, 0.0f)),   // "paraphrase" (scaled): flagged
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal: clean
      (3L, Array(1.0f, 1.0f, 0.0f, 0.0f)))   // cos ≈ 0.707 < 0.8: clean
      .toDF("vec_id", "embedding")
    val r = Decontam.semanticDecontam(corpus, bench, "vec_id", "embedding", 0.8)
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(r == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false), r.toString)
    // an EMPTY bench means nothing is contaminated — every corpus item
    // must survive with a false verdict, not vanish from the output
    // (the pre-r10 crossJoin erased the corpus; ADVICE r8)
    val empty = Decontam.semanticDecontam(corpus,
        bench.filter(col("vec_id") < 0), "vec_id", "embedding", 0.8)
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(empty == Map(0L -> false, 1L -> false, 2L -> false, 3L -> false),
      empty.toString)
  }

  test("blocked semantic decontam: full probe ≡ exact lane, verdicts one-sided, empty bench safe") {
    val e = graft.sources.TestData(spark, sf0001).embeddings
    val bench = e.filter(col("vec_id") % 100 === 0)
      .select(expr("vec_id DIV 100").as("vec_id"), col("embedding"))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "max_cos", "contaminated")
        .as[(Long, Option[Double], Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = toMap(Decontam.semanticDecontam(e, bench, "vec_id", "embedding", 0.8))
    // probing every cell recovers the exact lane bit-for-bit
    val full = toMap(Decontam.semanticDecontamBlocked(e, bench,
      "vec_id", "embedding", 0.8, nLists = 4, nProbe = 4))
    assert(full == exact, "nProbe = nLists must equal the exact lane")
    // blocked probing is one-sided: scores never exceed the exact max, so
    // a blocked 'contaminated' verdict implies the exact one
    val blocked = toMap(Decontam.semanticDecontamBlocked(e, bench,
      "vec_id", "embedding", 0.8, nLists = 4, nProbe = 2))
    assert(blocked.keySet == exact.keySet, "no corpus row may vanish")
    blocked.foreach { case (id, (cos, verdict)) =>
      assert(cos.get <= exact(id)._1.get + 1e-12, s"row $id scored above exact")
      assert(!verdict || exact(id)._2, s"row $id: blocked verdict not one-sided")
    }
    // empty bench: every row survives, uncontaminated
    val empty = toMap(Decontam.semanticDecontamBlocked(e,
      bench.filter(col("vec_id") < 0), "vec_id", "embedding", 0.8))
    assert(empty.size == exact.size && empty.values.forall(v => !v._2 && v._1.isEmpty))
  }

  test("repetition: degenerate doc scores high, diverse doc scores low") {
    val d = Seq(
      (1L, "spam spam spam spam"),   // 4 words 1 distinct; 3 bigrams all "spam spam"
      (2L, "one two three four")).toDF("doc_id", "text")
    val r = DataQuality.repetitionSignals(d, "doc_id", "text")
      .select("doc_id", "n_words", "n_distinct_words", "n_distinct_bigrams",
        "top_bigram_cnt", "dup_word_frac", "top_bigram_frac")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(r(0) === ((1L, 4L, 1L, 1L, 3L, 0.75, 1.0)))
    assert(r(1) === ((2L, 4L, 4L, 3L, 1L, 0.0, 1.0 / 3.0)))
  }

  test("lm score: mean conditional bigram probability, hand-checked") {
    val d = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // model: c(a,b)=2, c(b,a)=1, c(a,c)=1; heads a:3, b:1
    val pba = 2.0 / 3.0 // p(b|a)
    val pab = 1.0 / 1.0 // p(a|b)
    val pca = 1.0 / 3.0 // p(c|a)
    val r = LangModel.bigramScore(d, d, "doc_id", "text")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // doc 1 folds p in position order: (a,b), (b,a), (a,b)
    assert(r(0) === ((1L, 3L, (((0.0 + pba) + pab) + pba) / 3.0)))
    assert(r(1) === ((2L, 1L, pca / 1.0)))
  }

  test("lm score: unseen bigrams drop; docs under 2 tokens are absent") {
    val model = Seq((1L, "a b c")).toDF("doc_id", "text") // grams (a,b), (b,c)
    val docs = Seq((7L, "a b z z"), (8L, "z")).toDF("doc_id", "text")
    val r = LangModel.bigramScore(docs, model, "doc_id", "text")
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // doc 7: only (a,b) survives, p = 1.0; doc 8 has no bigrams at all
    assert(r.toSeq === Seq((7L, 1L, 1.0)))
  }

  test("lm score: penalizeUnseen divides by total bigrams (cross-corpus mode)") {
    val model = Seq((1L, "a b c")).toDF("doc_id", "text")
    // mostly-OOV doc: 3 bigrams, only (a,b) covered (p=1). Default mode
    // scores it a perfect 1.0 — the caveat; penalized mode scores 1/3.
    val docs = Seq((7L, "a b z z")).toDF("doc_id", "text")
    val loose = LangModel.bigramScore(docs, model, "doc_id", "text")
      .select("lm_score").as[Double].head()
    val strict = LangModel.bigramScore(docs, model, "doc_id", "text",
        penalizeUnseen = true)
      .select("lm_score").as[Double].head()
    assert(loose == 1.0 && strict == 1.0 / 3.0)
    // self-scoring (full coverage): both modes agree
    val a = LangModel.bigramScore(model, model, "doc_id", "text")
      .select("lm_score").as[Double].head()
    val b = LangModel.bigramScore(model, model, "doc_id", "text",
        penalizeUnseen = true)
      .select("lm_score").as[Double].head()
    assert(a == b)
  }

  test("segment dedup: duplicate windows keep first occurrence, docs rebuild in order") {
    // doc 1 and doc 2 share segment "a b"; doc 3 is entirely doc 1's content
    val d = Seq(
      (1L, "a b c d"),     // segments "a b", "c d"
      (2L, "a b e f"),     // "a b" dup → keeps only "e f"
      (3L, "c d")          // fully duplicate → vanishes
    ).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.dedupSegments(d, "doc_id", "text", segSize = 2)
      .select("doc_id", "n_kept", "cleaned_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, 2L, "a b c d"), (2L, 1L, "e f")))
  }

  test("segment dedup: kept tokens = distinct segment tokens on the fixture") {
    val docs = TestData(spark, sf0001).documents
    val out = graft.dedup.Dedup.dedupSegments(docs, "doc_id", "text", segSize = 8)
    val keptSegs = out.agg(sum("n_kept")).as[Long].head()
    val distinctSegs = graft.quality.Chunker
      .chunkByTokens(docs, "doc_id", "text", 8, 0)
      .select("chunk_text").distinct().count()
    assert(keptSegs === distinctSegs)
  }

  test("mixture: budgets cap rates, absent strata drop, membership = bernoulli hash") {
    val docs = TestData(spark, sf0001).documents
      .withColumn("n_tokens", graft.functions.TextFns.wordCount(col("text")).cast("long"))
    val out = Sampling.tokenBudgetMixture(docs, "doc_id", "lang", "n_tokens",
      Map("en" -> 400L, "es" -> 10000000L)).cache()
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "es")), s"absent strata leaked: $langs")
    // es budget >> corpus → threshold capped at Scale → ALL es docs kept
    val esAll = docs.filter(col("lang") === "es").count()
    assert(out.filter(col("lang") === "es").count() === esAll)
    // en kept-token total lands near the budget (hash noise aside)
    val enTokens = out.filter(col("lang") === "en")
      .agg(sum("n_tokens")).as[Long].head()
    val enTotal = docs.filter(col("lang") === "en").agg(sum("n_tokens")).as[Long].head()
    assert(enTokens < enTotal && enTokens > 0, s"en sampled $enTokens of $enTotal")
    // membership is the deterministic hash — partitioning-independent
    val again = Sampling.tokenBudgetMixture(docs.repartition(7), "doc_id", "lang",
      "n_tokens", Map("en" -> 400L, "es" -> 10000000L))
      .select("doc_id").as[Long].collect().toSet
    assert(again === out.select("doc_id").as[Long].collect().toSet)
  }

  test("stripBenchSpans: quoted eval item excised, unique prose kept, bench doc empties") {
    val bench = Seq((100L, "the exact eval question here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "INTRO the exact eval question here OUTRO1 OUTRO2"), // quotes the item
      (2L, "no overlap with anything in the benchmark"),
      (100L, "the exact eval question here")                    // the item itself
    ).toDF("doc_id", "text")
    val r = Decontam.stripBenchSpans(corpus, bench, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(r(1L) == ((1L, 8L, 3L, h("INTRO OUTRO1 OUTRO2"))), r(1L).toString)
    assert(r(2L)._3 == 7L && r(2L)._4 == h("no overlap with anything in the benchmark"))
    assert(r(100L)._3 == 0L && r(100L)._4 == h(""))
  }

  test("minhash calibration: identical docs agree on every lane; disjoint near-miss pairs agree on few") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "alpha beta gamma delta iota kappa lambda mu"),   // half-overlap head
      (4L, "nu xi omicron pi rho sigma tau upsilon")         // disjoint
    ).toDF("doc_id", "text")
    val cal = graft.dedup.Dedup.minHashCalibration(docs, "doc_id", "text",
      n = 3, k = 16, threshold = 0.01, maxDF = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // identical docs: J = 1 and EVERY lane agrees (min over equal sets)
    val (j12, a12, e12) = cal((1L, 2L))
    assert(j12 == 1.0 && a12 == 16L && e12 == 1.0,
      s"exact dup must calibrate to 1: $j12 $a12 $e12")
    // the partial pair exists with 0 < J < 1 and agreement within [0, 16]
    val (j13, a13, _) = cal((1L, 3L))
    assert(j13 > 0 && j13 < 1 && a13 >= 0 && a13 <= 16)
    // disjoint doc 4 shares no rare shingle -> no pair rows at all
    assert(!cal.keys.exists { case (x, y) => x == 4L || y == 4L })
    // estimator sanity on the real corpus: the mean |est - J| over fixture
    // pairs stays inside the k=16 binomial band (sd <= 0.5/sqrt(16))
    val fx = graft.dedup.Dedup.minHashCalibration(
      TestData(spark, sf0001).documents, "doc_id", "text",
      n = 3, k = 16, threshold = 0.1, maxDF = 100)
      .select(abs(col("sig_est") - col("jaccard")).as("gap"))
      .agg(avg("gap")).head().getDouble(0)
    assert(fx < 0.25, s"mean calibration gap $fx out of band")
  }

  test("canonicalizeUrl: each normalization rule, one probe each") {
    import graft.functions.TextFns
    val cases = Seq(
      // host+scheme case-fold; default port drop; trailing slash; fragment
      "HTTP://Example.COM:80/A/b/#frag" -> "http://example.com/A/b",
      // https default port; utm strip; param sort; empty query collapse
      "https://h.io:443/p?utm_source=x&b=2&a=1" -> "https://h.io/p?a=1&b=2",
      "https://h.io/p?utm_a=1&utm_b=2" -> "https://h.io/p",
      // NON-default port kept; path case kept
      "http://h.io:8080/Path" -> "http://h.io:8080/Path",
      // https with http's default port: kept (scheme-specific rule)
      "https://h.io:80/x" -> "https://h.io:80/x",
      // no path at all
      "http://H.io" -> "http://h.io",
      // unparseable → null
      "not a url" -> null)
    val got = cases.map(_._1).toDF("url")
      .select(TextFns.canonicalizeUrl(col("url")).as("c"))
      .as[Option[String]].collect().map(_.orNull)
    assert(got.toSeq == cases.map(_._2), got.mkString("; "))
  }

  test("CDC chunking: insert near the front re-chunks only to the next boundary; fixed-size shifts everything") {
    import graft.dedup.Dedup
    val text = (1 to 200).map(i => s"w${i % 37}x$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "INSERTED " + text)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_md5").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    // the CDC property: all chunks after the first boundary are content-
    // anchored, so the shifted doc SHARES most chunk hashes with the
    // original — only the prefix chunk(s) differ
    val shared = chunks(1L).intersect(chunks(2L)).size
    assert(shared >= chunks(1L).size - 2,
      s"CDC should re-chunk only the prefix: shared=$shared of ${chunks(1L).size}")
    // contrast: fixed-size 8-word segmentation shares (almost) NOTHING
    // after a 1-word insert — every segment boundary shifts
    val segs = graft.quality.Chunker.chunkByTokens(docs, "doc_id", "text", 8, 0)
      .select(col("doc_id"), md5(col("chunk_text")).as("h")).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    assert(segs(1L).intersect(segs(2L)).size <= 1,
      "fixed-size segmentation should share ~no segments after the insert")
    // determinism + coverage: chunk word counts sum back to the doc length
    val total = Dedup.cdcChunks(docs, "doc_id", "text")
      .filter(col("doc_id") === 1L).agg(sum("n_words")).head().getLong(0)
    assert(total == 200L)
  }
}
