package graft.multimodal

import org.apache.spark.sql.Dataset

/** NumPy `.npy` tensor container — how embeddings/features actually ship
  * between Python training stacks and a data engine. REAL format, both
  * header versions:
  *
  *  - magic `\x93NUMPY` + major.minor; v1.0 carries a uint16 LE header
  *    length, v2.0 a uint32 LE (the version split everyone forgets —
  *    synthetic shards alternate by id so both paths stay exercised);
  *  - the header is a Python dict LITERAL (`{'descr': '<f4',
  *    'fortran_order': False, 'shape': (r, c), }`) space-padded so the
  *    data start is 64-byte aligned — parsed here with a tolerant
  *    key-scanner, not an eval;
  *  - `fortran_order` changes the element layout (column-major): the
  *    decoder indexes by layout, and the gate emits an off-diagonal
  *    element so an order-ignoring reader is CAUGHT (a sum alone is
  *    layout-invariant and would hide the bug);
  *  - dtype is validated (`<f4` only — little-endian float32), the
  *    declared shape is checked against the actual byte length and a
  *    bomb cap BEFORE any allocation.
  *
  * Values are small integers stored as float32 (exactly representable),
  * so every emitted statistic is integer-exact cross-engine. */
object Npy {

  case class NpyFile(id: Long, media: Array[Byte])
  case class NpyFeatures(id: Long, version: Int, rows: Long, cols: Long,
                         fortran: Boolean, sum_vals: Long, v_0_1: Long)

  private val MaxElems = 1 << 24

  // ---- encode ------------------------------------------------------------

  private[graft] def valueAt(id: Long, i: Int, j: Int): Int =
    ((id + i * 3 + j) % 100).toInt

  private[graft] def encodeOne(id: Long): Array[Byte] = {
    val r = (2 + id % 5).toInt
    val c = (3 + id % 4).toInt
    val fortran = id % 5 == 0
    val v2 = id % 2 == 0 // header version 2.0 for even ids, 1.0 for odd
    val dict = s"{'descr': '<f4', 'fortran_order': ${if (fortran) "True" else "False"}, " +
      s"'shape': ($r, $c), }"
    val preLen = if (v2) 12 else 10 // magic(6) + ver(2) + hlen(2 or 4)
    val unpadded = preLen + dict.length + 1 // + '\n'
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val out = java.nio.ByteBuffer.allocate(preLen + header.length + r * c * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(0x93.toByte).put('N'.toByte).put('U'.toByte).put('M'.toByte)
      .put('P'.toByte).put('Y'.toByte)
    if (v2) { out.put(2.toByte).put(0.toByte).putInt(header.length) }
    else { out.put(1.toByte).put(0.toByte).putShort(header.length.toShort) }
    out.put(header.getBytes("US-ASCII"))
    // element order follows the declared layout
    if (!fortran)
      for (i <- 0 until r; j <- 0 until c) out.putFloat(valueAt(id, i, j).toFloat)
    else
      for (j <- 0 until c; i <- 0 until r) out.putFloat(valueAt(id, i, j).toFloat)
    out.array()
  }

  def syntheticNpy(ids: Dataset[Long]): Dataset[NpyFile] = {
    import ids.sparkSession.implicits._
    ids.map(id => NpyFile(id, encodeOne(id)))
  }

  // ---- decode ------------------------------------------------------------

  def decodeNpy(media: Dataset[NpyFile]): Dataset[NpyFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(r => decodeOne(r.id, r.media)))
  }

  private def findStr(h: String, key: String): Option[String] = {
    val i = h.indexOf(s"'$key':")
    if (i < 0) None
    else Some(h.drop(i + key.length + 3).dropWhile(c => c == ' '))
  }

  private[multimodal] def decodeOne(id: Long, b: Array[Byte]): Option[NpyFeatures] = {
    if (b.length < 10 || (b(0) & 0xff) != 0x93 ||
      new String(b, 1, 5, "US-ASCII") != "NUMPY") return None
    val major = b(6) & 0xff
    val (hLen, dataPre) = major match {
      case 1 =>
        ((b(8) & 0xff) | ((b(9) & 0xff) << 8), 10)
      case 2 =>
        if (b.length < 12) return None
        (((b(8) & 0xff) | ((b(9) & 0xff) << 8) | ((b(10) & 0xff) << 16) |
          ((b(11) & 0xff) << 24)), 12)
      case _ => return None
    }
    if (hLen < 0 || dataPre + hLen > b.length) return None // lying header length
    val h = new String(b, dataPre, hLen, "US-ASCII")
    if (!findStr(h, "descr").exists(_.startsWith("'<f4'"))) return None // dtype gate
    val fortran = findStr(h, "fortran_order") match {
      case Some(v) if v.startsWith("True") => true
      case Some(v) if v.startsWith("False") => false
      case _ => return None
    }
    val shape = findStr(h, "shape").getOrElse(return None)
    if (!shape.startsWith("(")) return None
    val dims = shape.drop(1).takeWhile(_ != ')').split(",")
      .map(_.trim).filter(_.nonEmpty)
    if (dims.length != 2) return None // this lane handles matrices
    val (r, c) = (dims(0).toLongOption.getOrElse(return None),
      dims(1).toLongOption.getOrElse(return None))
    // bomb cap — gate EACH dim before multiplying: a forged shape like
    // (2³², 2³²) wraps r*c to 0 in Long and would pass a product-only
    // check, then index past the buffer. Per-dim ≤ MaxElems keeps the
    // product ≤ MaxElems² ≪ Long.MaxValue, so the product test is exact.
    if (r <= 0 || c <= 0 || r > MaxElems || c > MaxElems ||
        r * c > MaxElems) return None
    val dataAt = dataPre + hLen
    if (dataAt + r * c * 4 > b.length) return None // shape lies about data
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def at(i: Long, j: Long): Float = {
      // layout-aware index: row-major i*c+j, column-major j*r+i
      val k = if (fortran) j * r + i else i * c + j
      bb.getFloat(dataAt + (k * 4).toInt)
    }
    var sum = 0L
    var i = 0L
    while (i < r) {
      var j = 0L
      while (j < c) {
        val f = at(i, j)
        if (f != math.rint(f)) return None // lane contract: integer-valued
        sum += f.toLong
        j += 1
      }
      i += 1
    }
    val v01 = if (c >= 2) at(0L, 1L).toLong else -1L
    Some(NpyFeatures(id, major, r, c, fortran, sum, v01))
  }
}
