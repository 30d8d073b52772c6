package graft

import graft.functions.Tokenizer

class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  // corpus gram counts by hand: ab:5, ba:2, bc:2, ca:1, aba:2, bab:2,
  // abc:2, bca:1, cab:1 → rank (count desc, token asc):
  // ab(5), aba(2), abc(2), ba(2), bab(2), bc(2), ...
  private def corpus = Seq((1L, "ababab"), (2L, "abcabc")).toDF("doc_id", "text")

  test("trainVocab ranks by count desc then token asc (total order)") {
    val v = Tokenizer.trainVocab(corpus, "text", minLen = 2, maxLen = 3,
        vocabSize = 6)
      .as[(String, Long)].collect().toSeq
    assert(v == Seq("ab" -> 5L, "aba" -> 2L, "abc" -> 2L, "ba" -> 2L,
      "bab" -> 2L, "bc" -> 2L))
  }

  test("encode takes the LONGEST vocab hit at each position") {
    val vocab = Seq("ab", "aba", "abc")
    val out = Tokenizer.encode(corpus, "doc_id", "text", vocab,
        minLen = 2, maxLen = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "ababab": aba|b|ab — greedy prefers aba over ab at pos 0, single-char
    // fallback at pos 3 (bab/ba not in vocab), then ab
    assert(out(1L) == ((3L, 2L, "aba")))
    // "abcabc": abc|abc
    assert(out(2L) == ((2L, 2L, "abc")))
  }

  test("encode falls back to single characters when nothing matches") {
    val docs = Seq((9L, "zzz"), (10L, "")).toDF("doc_id", "text")
    val out = Tokenizer.encode(docs, "doc_id", "text", Seq("ab"),
        minLen = 2, maxLen = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(9L) == ((3L, 0L, "z")))
    assert(out(10L) == ((0L, 0L, "")))
  }

  test("trainAndEncode is deterministic across runs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Tokenizer.trainAndEncode(docs, "doc_id", "text", vocabSize = 50)
      .collect().toSet
    val b = Tokenizer.trainAndEncode(docs, "doc_id", "text", vocabSize = 50)
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("trainBpe: hand-checked merge order on the classic low/lower corpus") {
    import spark.implicits._
    // word freqs: low×3, lower×2, lowest×1
    val docs = Seq((1L, "low low lower lowest"), (2L, "low lower")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(docs, "text", nMerges = 4)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // round 1: (l,o)=6 and (o,w)=6 tie -> lexicographic left tiebreak: (l,o)
    assert(m(0) == (1L, "l", "o", 6L))
    // round 2: (lo,w)=6 wins
    assert(m(1) == (2L, "lo", "w", 6L))
    // round 3: (low,e)=3 — "lower"×2 + "lowest"×1
    assert(m(2) == (3L, "low", "e", 3L))
    // round 4: (lowe,r)=2 vs (lowe,s)=1 and (s,t)=1 -> (lowe,r)
    assert(m(3) == (4L, "lowe", "r", 2L))
  }

  test("trainBpe: odd symbol runs merge left-to-right non-overlapping") {
    import spark.implicits._
    // "aaa" has pairs (a,a)x2; after merging (a,a) the word must become
    // [aa, a] (greedy scalar semantics), so round 2's top pair is (aa, a)
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = Tokenizer.trainBpe(docs, "text", nMerges = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(m(0) == (1L, "a", "a", 4L))  // 2 adjacent pairs × 2 words
    assert(m(1) == (2L, "aa", "a", 2L))
    // after round 2 every word is one symbol — the loop stops early
    val m3 = Tokenizer.trainBpe(docs, "text", nMerges = 5)
    assert(m3.count() == 2L, "no pairs remain once aaa fully merges")
  }

  test("bpeEncode: token counts under the learned merges are hand-exact") {
    import spark.implicits._
    val docs = Seq((1L, "low low lower lowest"), (2L, "low lower")).toDF("doc_id", "text")
    // 4 merges: (l,o) (lo,w) (low,e) (lowe,r) — so low→1, lower→1,
    // lowest→[lowe,s,t]=3 tokens
    val r = Tokenizer.trainAndEncodeBpe(docs, "doc_id", "text", nMerges = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == (1L, 4L, 6L), s"doc1: ${r(0)}")
    assert(r(1) == (2L, 2L, 2L), s"doc2: ${r(1)}")
    // zero merges = pure character tokenization
    val r0 = Tokenizer.bpeEncode(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r0(0) == (1L, 4L, 3 + 3 + 5 + 6L))
  }
}
