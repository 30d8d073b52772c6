package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the pre-release scrub every training
  * corpus runs (emails, phone numbers, IPv4 addresses, URLs masked to
  * typed placeholder tokens).
  *
  * Patterns stay inside the Java-regex ∩ RE2 common subset (character
  * classes, bounded repetition, `\b`; no lookaround, no backreferences) so
  * the exact same pattern string runs in Spark's codegen'd
  * `regexp_replace`/`regexp_extract_all` and replays in the DuckDB oracle
  * (`regexp_replace(..., 'g')`). Everything is a row-local column
  * expression: no UDFs, no shuffle — at 100 TB this is a map-only stage
  * that pipelines into whatever scan feeds it.
  *
  * Masking order matters and is fixed: URL first (a URL may embed
  * user:pass@host which the email pattern would half-eat), then email,
  * then IPv4 (before phone — dotted quads contain digit runs a loose
  * phone pattern could claim), then phone.
  */
object Redact {

  /** (type, pattern) in masking order. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "url" -> "https?://([A-Za-z0-9._%+-]+@)?[A-Za-z0-9.-]+(/[A-Za-z0-9._/-]*)?",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    "phone" -> "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}",
  )

  private def token(tpe: String): String = s"<${tpe.toUpperCase}>"

  /** Per-type match counts for one text column (one codegen'd pass/type). */
  def detectCounts(text: Column): Seq[(String, Column)] =
    piiPatterns.map { case (tpe, pat) =>
      tpe -> size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }

  /** All PII spans replaced by `<TYPE>` tokens, in [[piiPatterns]] order.
    * Chained replaces are safe because each earlier replacement emits a
    * token (`<URL>` etc.) that no later pattern can match. */
  def mask(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (tpe, pat)) =>
      regexp_replace(c, lit(pat), lit(token(tpe)))
    }

  /** Detection + masking over a corpus: per-doc counts of each PII type,
    * total, and the redacted text. Pure projection — no shuffle. */
  def redact(docs: DataFrame, id: String, text: String): DataFrame = {
    val counts = detectCounts(col(text))
    val total = counts.map(_._2).reduce(_ + _)
    docs.select(
      Seq(col(id)) ++
        counts.map { case (tpe, c) => c.as(s"n_$tpe") } ++
        Seq(total.as("n_pii"), mask(col(text)).as("redacted_text")): _*)
  }
}
