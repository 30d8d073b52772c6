package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * token counting, quality scoring, n-gram language ID, rolling-hash
  * fingerprinting. All pure column expressions (codegen'd, no UDFs), designed
  * so an identical algorithm is expressible in ANSI SQL for the oracle.
  */
object TextFns {

  /** Non-empty whitespace-split words. */
  def words(text: Column): Column =
    filter(split(text, " "), w => length(w) > 0)

  /** Null text → null count (the repo's coerce-to-null convention) —
    * Spark's legacy `size(null) = -1` otherwise leaks a sentinel into
    * arithmetic (caught by the text differential family: a null doc
    * scored -1 words and langId'd as 'de' via the all-equal argmax). */
  def wordCount(text: Column): Column =
    when(text.isNotNull, size(words(text)))

  /** Exact occurrence count of one word (list-filter, no overlap pitfalls). */
  def countWord(text: Column, word: String): Column =
    when(text.isNotNull, size(filter(split(text, " "), w => w === word)))

  /** BPE-ish token count: letter runs, digit runs, single other non-space. */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Total characters across words (exact integer arithmetic). */
  def totalWordChars(text: Column): Column =
    aggregate(transform(words(text), w => length(w)), lit(0), (a, b) => a + b)

  /** Ratio of words found in `stopwords`; null-safe for empty docs. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val n = wordCount(text)
    val hits = size(filter(words(text), w => w.isin(stopwords.map(lit): _*)))
    when(n > 0, round(hits.cast("double") / n.cast("double"), 6)).otherwise(lit(null))
  }

  /** Punctuation character ratio over total length. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      round(regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double") / length(text).cast("double"), 6))
      .otherwise(lit(null))

  /** Marker-word tables for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "los", "las", "una", "que"),
    "fr" -> Seq("le", "les", "et", "une", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和"),
  )

  /** Score for one language from a word-array column: ONE filter+isin pass.
    * Markers within a language are distinct words, so this equals the sum of
    * per-marker [[countWord]]s. Callers scoring several languages should
    * materialize the array in its own Project first (the `wordShingles`
    * pattern) — an inlined `split` is re-evaluated per consumer. */
  def langScoreFromWords(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(lit): _*)))

  /** Score for one language = total marker-word occurrences. */
  def langScore(text: Column, markers: Seq[String]): Column =
    langScoreFromWords(words(text), markers)

  /** Deterministic language ID from a MATERIALIZED word-array column:
    * argmax of marker scores, ties broken by language code ascending (so the
    * result is engine-independent). 5 array passes — vs 25 re-splits when
    * each marker word re-derived the array (measured 1.46 s → 0.35 s for
    * the langid gate at sf0.1). */
  def langIdFromWords(ws: Column): Column = {
    val scores = langMarkers.map { case (l, ms) => l -> langScoreFromWords(ws, ms) }
    val mx = greatest(scores.map(_._2): _*)
    // foldRight gives ascending priority: earliest lang wins ties. The
    // isNotNull guard keeps null docs null — without it size(null) = -1
    // makes every score "equal" and null docs come back 'de' (text
    // differential family catch).
    when(ws.isNotNull,
      scores.foldRight(lit(null).cast("string")) { case ((l, sc), acc) =>
        when(sc === mx, lit(l)).otherwise(acc)
      })
  }

  def langId(text: Column): Column = langIdFromWords(words(text))

  /** Rolling polynomial fingerprint over words:
    * h = fold(h*31 + (len(w)*131 + ascii(w[0]))) mod 1e9+7 — order-sensitive,
    * exact in int64, replayable in SQL via list_reduce. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(words(text), w => (length(w) * 131 + ascii(w)).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Syllable estimate for one word: vowel-group runs (the standard
    * heuristic), floored at 1 so consonant-only tokens still count. */
  def syllables(word: Column): Column =
    greatest(regexp_count(word, lit("[aeiouy]+")), lit(1))

  /** Exact total syllable estimate over a MATERIALIZED word array
    * (rule 3): integer fold, order-free. */
  def totalSyllablesFromWords(ws: Column): Column =
    aggregate(transform(ws, w => syllables(w)), lit(0), (a, b) => a + b).cast("long")

  /** URL canonicalization — the first dedup key every crawl pipeline
    * computes (the same page arrives as `HTTP://Example.COM:80/a/?b=2&a=1`
    * and `http://example.com/a?a=1&b=2`). Normalizations, each a pure
    * column expression an oracle replays verbatim:
    * scheme + host lowercased (path case is SIGNIFICANT and kept),
    * default ports dropped (`:80` for http, `:443` for https — only for
    * their own scheme), trailing path slashes stripped, the fragment
    * dropped, `utm_*` tracking params removed, surviving query params
    * SORTED (param order is transport noise). Unparseable urls → null
    * (coerce-to-null). Regex is RE2-safe: one pattern, capture groups,
    * no backreferences or lookarounds. */
  def canonicalizeUrl(url: Column): Column = {
    val pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/:?#]+)(:[0-9]+)?([^?#]*)(\\?[^#]*)?(#.*)?$"
    def part(i: Int) = regexp_extract(url, pat, i)
    val scheme = lower(part(1))
    val host = lower(part(2))
    val port = part(3)
    val path = regexp_replace(part(4), "/+$", "")
    val keepPort = when(
      (scheme === "http" && port === ":80") ||
        (scheme === "https" && port === ":443"), lit(""))
      .otherwise(port)
    val params = filter(split(regexp_replace(part(5), "^\\?", ""), "&"),
      p => length(p) > 0 && substring(p, 1, 4) =!= "utm_")
    val q = when(size(params) > 0,
      concat(lit("?"), array_join(sort_array(params), "&"))).otherwise(lit(""))
    when(part(2) === "", lit(null))
      .otherwise(concat(scheme, lit("://"), host, keepPort, path, q))
  }
}
