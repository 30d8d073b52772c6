package graft.multimodal

import org.apache.spark.sql.Dataset

/** REAL SubRip (.srt) subtitle parser — the caption/transcript container
  * video-text pairing pipelines align against (WebVTT's older sibling;
  * every speech dataset ships one). Small format, classic traps, all
  * implemented and verified:
  *
  *  - timestamps are `HH:MM:SS,mmm` with a COMMA millisecond separator
  *    (the №1 SRT interop bug — WebVTT uses a dot; the parser accepts
  *    exactly the comma form and rejects the rest);
  *  - cue blocks are index / timing / 1..n text lines, separated by blank
  *    lines; text may span MULTIPLE lines (the second trap — readers that
  *    take one line drop half the words);
  *  - a cue whose end ≤ start, or whose timing line is malformed, DROPS
  *    that cue (coerce-to-null at cue granularity); a file with no valid
  *    cue drops entirely;
  *  - `monotonic` reports whether cue starts are non-decreasing — real
  *    subtitle QA (out-of-order cues break players and alignment).
  *
  * Row-local `mapPartitions`; exact integer milliseconds end to end.
  */
object Srt {

  case class SrtFile(id: Long, media: String)
  case class SrtInfo(id: Long, n_cues: Long, total_ms: Long,
                     n_text_chars: Long, max_end_ms: Long, monotonic: Boolean)

  /** Fixture formulas (shared with the oracle): n = 2 + id % 4 cues;
    * cue j starts at j·4000 + id % 1000 ms, lasts 1500 + (id+j) % 2000 ms,
    * and carries 1 + (id+j) % 3 text lines of the form `w<id> line<j> t<k>`. */
  def syntheticSrt(ids: Dataset[Long]): Dataset[SrtFile] = {
    import ids.sparkSession.implicits._
    ids.map { id => SrtFile(id, encodeOne(id)) }
  }

  private def fmtTs(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"

  def encodeOne(id: Long): String = {
    val n = (2 + id % 4).toInt
    (0 until n).map { j =>
      val start = j * 4000L + id % 1000
      val end = start + 1500 + (id + j) % 2000
      val lines = (0 until (1 + (id + j) % 3).toInt)
        .map(k => s"w$id line$j t$k").mkString("\n")
      s"${j + 1}\n${fmtTs(start)} --> ${fmtTs(end)}\n$lines"
    }.mkString("", "\n\n", "\n")
  }

  private val TimingRe =
    """(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})""".r

  def decodeSrt(media: Dataset[SrtFile]): Dataset[SrtInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private[multimodal] def decodeOne(id: Long, s: String): Option[SrtInfo] = {
    // blocks split on blank lines (tolerate \r\n — SRT files are often CRLF)
    val blocks = s.replace("\r\n", "\n").split("\n\\s*\n").filter(_.trim.nonEmpty)
    var nCues = 0L; var totalMs = 0L; var chars = 0L
    var maxEnd = 0L; var lastStart = Long.MinValue; var monotonic = true
    blocks.foreach { blk =>
      val lines = blk.split("\n")
      // index line + timing line + ≥1 text line
      if (lines.length >= 3 && lines(0).trim.forall(_.isDigit) &&
          lines(0).trim.nonEmpty) {
        lines(1).trim match {
          case TimingRe(h1, m1, s1, ms1, h2, m2, s2, ms2) =>
            def ms(h: String, m: String, sec: String, mil: String): Long =
              h.toLong * 3600000 + m.toLong * 60000 + sec.toLong * 1000 + mil.toLong
            val start = ms(h1, m1, s1, ms1)
            val end = ms(h2, m2, s2, ms2)
            if (end > start) { // zero/negative-length cue drops
              nCues += 1
              totalMs += end - start
              chars += lines.drop(2).map(_.length.toLong).sum
              maxEnd = math.max(maxEnd, end)
              if (start < lastStart) monotonic = false
              lastStart = start
            }
          case _ => () // malformed timing: drop the cue
        }
      }
    }
    if (nCues == 0) None
    else Some(SrtInfo(id, nCues, totalMs, chars, maxEnd, monotonic))
  }
}
