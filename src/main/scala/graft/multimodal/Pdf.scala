package graft.multimodal

import org.apache.spark.sql.Dataset
import java.nio.charset.StandardCharsets

/** REAL pure-JVM PDF metadata codec — the classic cross-reference-table
  * document container (the format most document corpora arrive in). The
  * lane implements the actual random-access discipline a conformant
  * reader uses, not a regex over the whole file:
  *
  *  - the file is entered from the END: scan back for `startxref`, read
  *    the byte offset, and jump to the `xref` keyword — a reader that
  *    scans forward instead breaks on incrementally-updated files;
  *  - xref records are EXACTLY 20 bytes (`9999999999 99999 n\r\n` — a
  *    10-digit offset, 5-digit generation, in-use flag, 2-byte EOL that
  *    may be `\r\n` OR ` \n`) — the fixed-width contract that makes the
  *    table random-accessible; the fixture alternates both EOL forms;
  *  - every in-use record's offset is VERIFIED to land on its own
  *    `<num> 0 obj` header (a forged table drops the file — offsets are
  *    the whole point of an xref);
  *  - the trailer dict's `/Size` must equal the record count and `/Root`
  *    must resolve to a `/Type /Catalog` whose `/Pages` tree `/Count`
  *    matches the number of `/Type /Page` kids actually present.
  *
  * Truncation, offset forgeries, size lies, and absurd record counts
  * drop (coerce-to-null). Decode is row-local `mapPartitions`.
  */
object Pdf {

  case class PdfFile(id: Long, media: Array[Byte])
  case class PdfMeta(id: Long, version: String, n_objects: Int, n_pages: Int,
                     page_w: Int, page_h: Int)

  private val MaxObjects = 1024

  /** Fixture formulas shared with the oracle. */
  def shape(id: Long): (String, Int, Int, Int) = {
    val version = if (id % 2 == 0) "1.4" else "1.7"
    val nPages = (1 + id % 4).toInt
    val w = (400 + id % 200).toInt
    val h = (500 + (3 * id) % 300).toInt
    (version, nPages, w, h)
  }

  def syntheticPdf(ids: Dataset[Long]): Dataset[PdfFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => PdfFile(id, encodeOne(id)))
  }

  def encodeOne(id: Long): Array[Byte] = {
    val (version, nPages, w, h) = shape(id)
    val sb = new StringBuilder
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(num: Int, body: String): Unit = {
      offsets += sb.length
      sb.append(s"$num 0 obj\n$body\nendobj\n")
    }
    sb.append(s"%PDF-$version\n")
    val kids = (0 until nPages).map(p => s"${3 + p} 0 R").mkString(" ")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [ $kids ] /Count $nPages >>")
    (0 until nPages).foreach { p =>
      obj(3 + p, s"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 $w $h ] >>")
    }
    if (id % 3 == 0)
      obj(3 + nPages, s"<< /Producer (graft) /N $id >>") // an Info-style extra
    val xrefAt = sb.length
    val m = offsets.length + 1 // + the free object 0
    sb.append(s"xref\n0 $m\n")
    sb.append("0000000000 65535 f \n") // the free-list head, space-EOL form
    offsets.zipWithIndex.foreach { case (off, i) =>
      val eol = if (i % 2 == 0) "\r\n" else " \n" // both legal 2-byte EOLs
      sb.append(f"$off%010d 00000 n$eol")
    }
    sb.append(s"trailer\n<< /Size $m /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF")
    sb.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  def decodePdf(media: Dataset[PdfFile]): Dataset[PdfMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String = {
    // clamp BOTH ends: a forged xref offset past EOF would otherwise hand
    // `new String` a start beyond the array (IndexOutOfBounds fires before
    // any startsWith can return false and kill the task instead of
    // dropping the row)
    val f = math.max(0, math.min(from, b.length))
    new String(b, f, math.max(0, math.min(until, b.length) - f),
      StandardCharsets.ISO_8859_1)
  }

  private[multimodal] def looksLikePdf(b: Array[Byte]): Boolean =
    b.length >= 16 && ascii(b, 0, 5) == "%PDF-" &&
      ascii(b, math.max(0, b.length - 512), b.length).contains("startxref")

  private val MediaBoxRe =
    """/MediaBox \[ 0 0 (\d+) (\d+) \]""".r
  private val CountRe = """/Count (\d+)""".r
  private val SizeRe = """/Size (\d+)""".r
  private val RootRe = """/Root (\d+) 0 R""".r
  private val PagesRefRe = """/Pages (\d+) 0 R""".r
  private val KidsRe = """/Kids \[([ 0-9R]*)\]""".r

  /** Defense-in-depth wrapper: a malformed PDF must never kill the task —
    * any residual parser exception coerces to a dropped row. */
  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[PdfMeta] =
    scala.util.Try(decodeOneUnsafe(id, b)).toOption.flatten

  private def decodeOneUnsafe(id: Long, b: Array[Byte]): Option[PdfMeta] = {
    if (b.length < 16 || ascii(b, 0, 5) != "%PDF-") return None
    val version = ascii(b, 5, 8)
    // enter from the END: locate startxref in the tail window
    val tail = ascii(b, math.max(0, b.length - 512), b.length)
    val sxAt = tail.lastIndexOf("startxref")
    if (sxAt < 0) return None
    val xrefAt = tail.substring(sxAt + 9).trim.takeWhile(_.isDigit) match {
      case "" => return None
      case ds => ds.toLong
    }
    if (xrefAt < 0 || xrefAt + 6 > b.length) return None
    val at = xrefAt.toInt
    if (ascii(b, at, at + 4) != "xref") return None
    // subsection header: "0 M"
    val headEnd = {
      var i = at + 4
      while (i < b.length && (b(i) == '\n' || b(i) == '\r')) i += 1
      var j = i
      while (j < b.length && b(j) != '\n') j += 1
      (i, j)
    }
    val head = ascii(b, headEnd._1, headEnd._2).trim.split(" ")
    if (head.length != 2 || head(0) != "0") return None
    val m = head(1).toIntOption.getOrElse(return None)
    if (m < 1 || m > MaxObjects) return None
    var rec = headEnd._2 + 1
    if (rec + 20L * m > b.length) return None
    // record 0 must be the free head
    if (!ascii(b, rec, rec + 18).startsWith("0000000000 65535 f")) return None
    rec += 20
    // every in-use record must land on its own object header
    val offsets = (1 until m).map { i =>
      val line = ascii(b, rec, rec + 20)
      rec += 20
      val off = line.substring(0, 10).toIntOption.getOrElse(return None)
      if (line.charAt(17) != 'n') return None
      if (!ascii(b, off, off + 16).startsWith(s"$i 0 obj")) return None
      off
    }
    // trailer dict follows the table
    val trailer = ascii(b, rec, math.min(b.length, rec + 256))
    if (!trailer.contains("trailer")) return None
    // toIntOption throughout: a >10-digit forged digit run must drop the
    // row, not overflow-throw (the regexes only bound the charset)
    val size = SizeRe.findFirstMatchIn(trailer)
      .flatMap(_.group(1).toIntOption).getOrElse(return None)
    if (size != m) return None
    val rootNum = RootRe.findFirstMatchIn(trailer)
      .flatMap(_.group(1).toIntOption).getOrElse(return None)
    if (rootNum < 1 || rootNum >= m) return None
    def objBody(num: Int): String = {
      val off = offsets(num - 1)
      val until = ascii(b, off, math.min(b.length, off + 512))
      val e = until.indexOf("endobj")
      if (e < 0) until else until.substring(0, e)
    }
    val root = objBody(rootNum)
    if (!root.contains("/Type /Catalog")) return None
    val pagesNum = PagesRefRe.findFirstMatchIn(root)
      .flatMap(_.group(1).toIntOption).getOrElse(return None)
    if (pagesNum < 1 || pagesNum >= m) return None
    val pages = objBody(pagesNum)
    val count = CountRe.findFirstMatchIn(pages)
      .flatMap(_.group(1).toIntOption).getOrElse(return None)
    val kids = KidsRe.findFirstMatchIn(pages).map(_.group(1).trim)
      .getOrElse(return None)
    // each kid ref must be a well-formed `<num> 0 R` triple — an empty or
    // R-leading /Kids array previously threw instead of dropping
    val kidToks = if (kids.isEmpty) Array.empty[String] else kids.split(" ")
    if (kidToks.length % 3 != 0) return None
    val kidNums = kidToks.grouped(3).map { t =>
      if (t(1) != "0" || t(2) != "R") return None
      t(0).toIntOption.getOrElse(return None)
    }.toSeq
    if (kidNums.length != count) return None // /Count must match the kids
    if (kidNums.exists(k => k < 1 || k >= m)) return None
    val pageBodies = kidNums.map(objBody)
    if (!pageBodies.forall(_.contains("/Type /Page "))) return None
    val mb = MediaBoxRe.findFirstMatchIn(pageBodies.head)
      .getOrElse(return None)
    Some(PdfMeta(id, version, m - 1, count,
      mb.group(1).toIntOption.getOrElse(return None),
      mb.group(2).toIntOption.getOrElse(return None)))
  }
}
