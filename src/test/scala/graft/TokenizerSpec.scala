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
}
