package graft

import org.apache.spark.sql.functions._

import graft.ann.Quant
import graft.quality.{DataQuality, Redact}

class RedactQuantSpec extends SparkSpec {
  import spark.implicits._

  test("redact: every PII type detected, masked to typed tokens, clean text untouched") {
    val d = Seq(
      (1L, "mail me at jo.doe+x@mail7.example.com or +86-555-0042 thanks"),
      (2L, "server 10.55.0.12 serves https://site9.example.org/p/123 daily"),
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val r = Redact.redact(d, "doc_id", "text")
      .select("doc_id", "n_url", "n_email", "n_ipv4", "n_phone", "n_pii", "redacted_text")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) === ((1L, 0L, 1L, 0L, 1L, 2L, "mail me at <EMAIL> or <PHONE> thanks")))
    assert(r(1) === ((2L, 1L, 0L, 1L, 0L, 2L, "server <IPV4> serves <URL> daily")))
    assert(r(2) === ((3L, 0L, 0L, 0L, 0L, 0L, "nothing sensitive here at all")))
  }

  test("redact: url masked before its credentials leak to the email pattern") {
    val d = Seq((1L, "fetch https://user@host.example.com/path now")).toDF("doc_id", "text")
    val masked = Redact.redact(d, "doc_id", "text")
      .select("redacted_text").as[String].head()
    // the email pattern alone WOULD match user@host.example.com; URL-first
    // ordering must claim the whole span
    assert(masked === "fetch <URL>/path now" || masked === "fetch <URL> now")
  }

  test("blocklist filter: counts, fraction, verdict") {
    val d = Seq(
      (1L, "good words only here"),
      (2L, "bad bad bad x"),
      (3L, "")
    ).toDF("doc_id", "text")
    val r = DataQuality.blocklistFilter(d, "doc_id", "text", Seq("bad"), maxFrac = 0.5)
      .select("doc_id", "n_words", "n_blocked", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq === Seq((1L, 4L, 0L, true), (2L, 4L, 3L, false), (3L, 0L, 0L, true)))
  }

  test("quantize: known vector round-trips exactly at the grid points") {
    // max|x| = 12.7 -> scale = 0.1; every element is a multiple of 0.1 in
    // DOUBLE arithmetic only approximately — so check codes, not error zero
    val d = Seq((1L, Array(12.7f, -6.35f, 0.0f, 1.27f))).toDF("vec_id", "embedding")
    val r = Quant.quantizeInt8(d, "vec_id", "embedding")
      .select("n_dims", "scale", "code_energy").as[(Long, Double, Long)].head()
    assert(r._1 === 4L)
    // 12.7f widens to 12.699999809…; scale inherits the float ulp
    assert(math.abs(r._2 - 0.1) < 1e-7)
    // codes: 127, -63 or -64 (half-up on the halfway ulp), 0, 13
    val codes = 127L * 127L
    assert(r._3 === codes + 64L * 64L + 13L * 13L || r._3 === codes + 63L * 63L + 13L * 13L)
  }

  test("quantize: zero vector -> zero scale, zero codes; fixture error is small") {
    val z = Seq((1L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val rz = Quant.quantizeInt8(z, "vec_id", "embedding")
      .select("scale", "code_energy", "recon_err").as[(Double, Long, Double)].head()
    assert(rz === ((0.0, 0L, 0.0)))

    val emb = sources.TestData(spark, sf0001).embeddings
    val stats = Quant.quantizeInt8(emb, "vec_id", "embedding")
      .agg(max(col("recon_err")).as("max_err"), min(col("code_energy")).as("min_e"))
      .as[(Double, Long)].head()
    // per-dim error is bounded by (scale/2)^2; scales here are ~3e-3 so the
    // 64-dim total stays far below 1e-3
    assert(stats._1 < 1e-3 && stats._1 > 0.0)
    assert(stats._2 > 0L)
  }

  test("int8TopK: SQ8 retrieval holds a recall floor vs the exact brute lane") {
    val e = sources.TestData(spark, sf0001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val sq = Quant.int8TopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val exact = graft.ann.Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(exact.size == 50 && sq.size == 50)
    val recall = (sq & exact).size.toDouble / exact.size
    // measured 0.98 on the unit-norm fixture (int8 error barely perturbs
    // the ranking); 0.8 is the guard against a quantization regression
    assert(recall >= 0.8, s"SQ8 recall@5 collapsed to $recall")
  }

  test("binaryTopK: hand-checked sign packing and Hamming ranking") {
    // dIn=4 -> one word; signs of (+,-,+,0) -> bits 0,2 -> 0b0101 = 5
    val corpus = Seq(
      (1L, Array(1.0f, -1.0f, 2.0f, 0.0f)),   // word 5
      (2L, Array(1.0f, 1.0f, 2.0f, -1.0f)),   // word 0b0111 = 7
      (3L, Array(-1.0f, -1.0f, -2.0f, 1.0f))) // word 0b1000 = 8
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    val got = Quant.binaryTopK(corpus, q, "vec_id", "embedding", k = 2, dIn = 4)
      .orderBy("rank")
      .select("neighbor_id", "rank", "hamming").as[(Long, Long, Long)].collect()
    // vs 5: ham(7)=popcount(2)=1, ham(8)=popcount(13)=3
    assert(got.toSeq === Seq((2L, 1L, 1L), (3L, 2L, 3L)))
  }

  test("binaryTopK: 1-bit retrieval holds a recall floor vs the exact brute lane") {
    val e = sources.TestData(spark, sf0001).embeddings
    val q = e.filter(col("vec_id") < 10)
    val bin = Quant.binaryTopK(e, q, "vec_id", "embedding", 5, dIn = 64)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val exact = graft.ann.Ann.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(bin.size == 50 && exact.size == 50)
    val recall = (bin & exact).size.toDouble / exact.size
    // 1 bit/dim is the lossy extreme of the quantization ladder — the
    // floor documents "still correlated with cosine", not SQ8-class recall
    assert(recall >= 0.1, s"binary recall@5 collapsed to $recall")
    // the PRODUCTION framing is candidate generation: Hamming top-50 must
    // cover most of the exact top-5, so a cheap exact re-rank of the
    // shortlist (the Pq.rerank pattern) recovers SQ8-class quality while
    // the full scan stays 1 bit/dim
    val cand = Quant.binaryTopK(e, q, "vec_id", "embedding", 50, dIn = 64)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val covered = (cand & exact).size.toDouble / exact.size
    println(s"[spec] binary recall@5=$recall candidate-coverage@50=$covered")
    assert(covered >= 0.5, s"Hamming shortlist stopped covering exact top-5: $covered")
  }

  test("randomProject: matches the scalar fold over the md5 sign matrix exactly") {
    val vec = Array(1.5f, -2.25f, 0.5f, 4.0f, -0.125f, 3.0f)
    val d = Seq((7L, vec)).toDF("vec_id", "embedding")
    val got = Quant.randomProject(d, "vec_id", "embedding", dOut = 3, dIn = 6)
      .orderBy("out_dim").select("proj").as[Double].collect()
    val signs = Quant.jlSignMatrix(3, 6)
    val want = (0 until 3).map { j =>
      vec.map(_.toDouble).zip(signs(j)).foldLeft(0.0) { case (a, (x, sgn)) => a + x * sgn }
    }
    // exact IEEE replay: same casts, same products, same fold order
    assert(got.toSeq == want, s"${got.toSeq} vs $want")
  }

  test("randomProject: sign matrix is balanced-ish and preserves inner products in expectation") {
    val m = Quant.jlSignMatrix(16, 64)
    val plus = m.flatten.count(_ == 1.0)
    // 1024 parity bits of md5 output: a wild imbalance means a broken parse
    assert(plus > 400 && plus < 624, s"+1 count $plus of 1024")
    // E[<Px,Py>]/dOut = <x,y>: sampled fixture pairs should land within JL
    // distortion of the true inner product, on average
    val embs = sources.TestData(spark, sf0001).embeddings.limit(40)
    val p = Quant.randomProject(embs, "vec_id", "embedding", dOut = 16, dIn = 64)
      .groupBy("vec_id").agg(collect_list(struct(col("out_dim"), col("proj"))).as("pv"))
      .select(col("vec_id"), expr("transform(array_sort(pv), s -> s.proj)").as("pv"))
      .as[(Long, Seq[Double])].collect().toMap
    val orig = embs.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val ids = orig.keys.toSeq.sorted
    val errs = for (i <- ids.indices; j <- i + 1 until ids.size) yield {
      val t = dot(orig(ids(i)).map(_.toDouble), orig(ids(j)).map(_.toDouble))
      val e = dot(p(ids(i)), p(ids(j))) / 16.0
      math.abs(e - t)
    }
    val meanErr = errs.sum / errs.size
    // unit-ish vectors: |<x,y>| <= 1; mean JL estimate error ~ 1/sqrt(16)
    assert(meanErr < 0.5, s"mean inner-product estimate error $meanErr")
  }
}
