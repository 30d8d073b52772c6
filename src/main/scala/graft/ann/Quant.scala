package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage/bandwidth
  * lane of a 100 TB vector corpus (4 B float32 → 1 B int8 per dim before
  * the ANN index is built; IVF/LSH probe quality is unchanged at this
  * precision for cosine ranking).
  *
  * Symmetric per-vector scheme: `scale = max|x| / 127`,
  * `q_i = halfUp(x_i / scale)` — max|x| maps to ±127 exactly, so no clip
  * branch exists. All row-local array expressions; no shuffle, no UDF.
  *
  * Cross-engine determinism (the oracle replays this in DuckDB):
  *  - float32 → double casts are exact; max over exact values is
  *    order-free;
  *  - `x/scale` is one IEEE double op — identical on both engines;
  *  - half-up via `floor(v + 0.5)` (Java `round()` and DuckDB `round()`
  *    disagree on negative halves; floor form is engine-free);
  *  - the reconstruction-error sum is a SEQUENTIAL fold in index order
  *    ([[graft.functions.Coerce]] rule: never rely on agg order for
  *    float sums).
  */
object Quant {

  /** Elements as exact doubles. */
  private def asDouble(vec: Column): Column =
    transform(vec, x => x.cast("double"))

  /** Per-vector symmetric int8 scale (0.0 for the all-zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(asDouble(vec), x => abs(x))) / lit(127.0)

  /** Quantized codes as an int array; all-zero vectors quantize to zeros. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(asDouble(vec), x =>
      when(scale > 0.0, floor(x / scale + lit(0.5)).cast("int")).otherwise(lit(0)))

  /** Quantize an embedding table: codes, scale, exact-integer code energy,
    * and the sequential-fold reconstruction error.
    *
    * `dvec`/`scale`/`codes` are materialized as named columns in their own
    * Projects (rule: a scalar like `scale` referenced inside a per-element
    * lambda would otherwise re-run its `array_max` for EVERY element —
    * O(dims²)/row; CollapseProject keeps non-cheap multi-referenced
    * expressions staged). */
  def quantizeInt8(embeddings: DataFrame, id: String, vec: String): DataFrame = {
    val staged = embeddings
      .select(col(id), asDouble(col(vec)).as("dvec"))
      .select(col(id), col("dvec"),
        (array_max(transform(col("dvec"), x => abs(x))) / lit(127.0)).as("scale"))
      .select(col(id), col("dvec"), col("scale"),
        transform(col("dvec"), x =>
          when(col("scale") > 0.0, floor(x / col("scale") + lit(0.5)).cast("int"))
            .otherwise(lit(0))).as("codes"))
    staged.select(
      col(id),
      size(col("dvec")).cast("long").as("n_dims"),
      col("scale"),
      aggregate(col("codes"), lit(0L), (a, q) => a + q.cast("long") * q.cast("long"))
        .as("code_energy"),
      aggregate(
        zip_with(col("dvec"), col("codes"),
          (x, q) => (x - q.cast("double") * col("scale")) *
            (x - q.cast("double") * col("scale"))),
        lit(0.0), (a, e) => a + e).as("recon_err"))
  }

  /** Approximate top-k retrieval OVER the int8 codes (FAISS `SQ8` flat
    * scan): score = (q̂·ĉ)·s_q·s_c — the integer code dot (exact in BIGINT)
    * descaled by the two per-vector scales, which approximates ⟨q, c⟩ to
    * quantization error. The 100 TB point is the scan: 1 B/dim instead of
    * 4 B, so the brute-force lane reads 4× less corpus bandwidth at ~equal
    * ranking quality (recall floor spec-asserted vs the exact brute lane).
    *
    * Plan shape = the brute-force lane's: the (bounded) query set
    * broadcasts with its codes inlined, the corpus streams ONCE through
    * the integer fold, one per-query rank window cuts top-k. In a real
    * deployment the corpus side persists [[quantizeInt8]] output so the
    * scan never touches floats; the gate quantizes inline (same formula,
    * same verdicts) to stay self-contained.
    *
    * Determinism: the code dot is integer-exact; the descale is two IEEE
    * multiplies on exact inputs; ties break on neighbor id — replayed
    * verbatim in the oracle. */
  def int8TopK(embeddings: DataFrame, queries: DataFrame,
               id: String, vec: String, k: Int): DataFrame = {
    def coded(df: DataFrame, side: String): DataFrame = df
      .select(col(id).as(s"${side}_id"), asDouble(col(vec)).as("dvec"))
      .select(col(s"${side}_id"), col("dvec"),
        (array_max(transform(col("dvec"), x => abs(x))) / lit(127.0))
          .as(s"${side}_scale"))
      .select(col(s"${side}_id"), col(s"${side}_scale"),
        transform(col("dvec"), x =>
          when(col(s"${side}_scale") > 0.0,
            floor(x / col(s"${side}_scale") + lit(0.5)).cast("int"))
            .otherwise(lit(0))).as(s"${side}_codes"))
    val c = coded(embeddings, "neighbor")
    val q = coded(queries, "query")
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (aggregate(
          zip_with(col("query_codes"), col("neighbor_codes"),
            (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double")
          * col("query_scale") * col("neighbor_scale")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Sign bits of a double-element vector packed into 32-bit words (as
    * BIGINTs): word `w` holds dims [32w, 32w+31], bit `j` set iff
    * `vec[32w+j] > 0`. 32 bits per word — not 64 — keeps every bit weight
    * a POSITIVE literal (`1L << j`, j ≤ 31), so the same `CASE … + …` sum
    * replays in any engine with checked BIGINT arithmetic (the
    * [[graft.dedup.Dedup]] SimHash precedent; a 64-bit word's top bit is
    * `Long.MinValue` and engines disagree on how to spell it). */
  def signWords(vec: Column, dIn: Int): Seq[Column] =
    (0 until (dIn + 31) / 32).map { w =>
      (0 until 32).withFilter(j => w * 32 + j < dIn).map { j =>
        when(element_at(vec, w * 32 + j + 1) > 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** Binary (1-bit sign) quantization retrieval — FAISS `BinaryFlat` /
    * the RaBitQ-family storage extreme: each dim keeps only its sign, so a
    * 64-dim float32 vector becomes 8 bytes and the brute scan reads 32×
    * less corpus bandwidth than the exact lane. Ranking is by Hamming
    * distance between packed sign words — `bit_count(xor)` per word, a
    * handful of ALU ops per candidate, no float math in the scan at all.
    * The recall loss vs exact cosine is the price (floor spec-asserted);
    * the production shape pairs this with an exact re-rank of the
    * surviving candidates (the [[graft.ann.Pq]] rerank pattern applies
    * unchanged).
    *
    * Plan shape = the brute lanes': queries broadcast with their packed
    * words inlined, the corpus streams once, one per-query rank window
    * cuts top-k. Determinism: Hamming is exact integer; ties break on
    * neighbor id — replayed verbatim by the oracle. */
  def binaryTopK(embeddings: DataFrame, queries: DataFrame,
                 id: String, vec: String, k: Int, dIn: Int): DataFrame = {
    val nWords = (dIn + 31) / 32
    def packed(df: DataFrame, side: String): DataFrame = {
      val staged = df.select(col(id).as(s"${side}_id"), asDouble(col(vec)).as("dvec"))
      staged.select(col(s"${side}_id") +:
        signWords(col("dvec"), dIn).zipWithIndex.map { case (c, i) =>
          c.as(s"${side}_w$i")
        }: _*)
    }
    val c = packed(embeddings, "neighbor")
    val q = packed(queries, "query")
    val hamming = (0 until nWords).map { i =>
      bit_count(col(s"query_w$i").bitwiseXOR(col(s"neighbor_w$i"))).cast("long")
    }.reduce(_ + _)
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), hamming.as("hamming"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("hamming"))
  }

  /** Deterministic SIGNED PERMUTATION of dimension `d` — the cheapest
    * exactly-orthogonal rotation there is (a permutation matrix with ±1
    * entries): it preserves norms and inner products EXACTLY (every
    * product term is the same float multiply, merely reordered), needs no
    * stored state (md5 Fisher–Yates + md5 sign parities, the
    * [[jlSignMatrix]] contract), and costs d moves per vector instead of
    * a d×d multiply. The OPQ intuition at zero matrix cost: shuffling
    * dimensions across PQ sub-spaces decorrelates what each sub-quantizer
    * sees. Returns (perm, signs): rotated[j] = signs(j) · v(perm(j)). */
  def signedPermutation(d: Int): (Array[Int], Array[Int]) = {
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val perm = (0 until d).toArray
    var i = d - 1
    while (i >= 1) {
      val j = (h(s"perm,$i") % (i + 1)).toInt
      val t = perm(i); perm(i) = perm(j); perm(j) = t
      i -= 1
    }
    val signs = Array.tabulate(d)(j => if (h(s"sign,$j") % 2 == 0) 1 else -1)
    (perm, signs)
  }

  /** Apply a signed permutation to an array column (float element type is
    * preserved — negation is exact in IEEE). Row-local, codegen'd. */
  def rotateColumn(vec: Column, perm: Array[Int], signs: Array[Int]): Column =
    array(perm.indices.map { j =>
      val e = element_at(vec, perm(j) + 1)
      if (signs(j) < 0) negate(e) else e
    }: _*)

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (Achlioptas 2003
    * database-friendly projections, the p=1/2 variant): the sign of cell
    * (j, k) is a pure function of md5("j,k"), so the matrix needs no
    * stored state, no RNG, and no seed handshake — ANY engine (or a
    * re-run after a lost cluster) reconstructs the identical matrix from
    * the formula. 15 hex chars = 60 bits, parity decides the sign. */
  def jlSignMatrix(dOut: Int, dIn: Int): Array[Array[Double]] =
    Array.tabulate(dOut, dIn) { (j, k) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j,$k".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }

  /** Random-projection dimensionality reduction (dIn → dOut), the
    * pre-ANN bandwidth lane: with sign projections, E[⟨Px, Py⟩/dOut] =
    * ⟨x, y⟩, so cosine ranking survives the reduction to within JL
    * distortion while the vector shrinks dIn/dOut ×.
    *
    * Returns (id, out_dim, proj) — one row per output coordinate.
    * Determinism: each coordinate is a SEQUENTIAL fold in input-dim order
    * over `x_k · s_jk` (float→double casts exact, ±1 multiplies exact, the
    * fold order pinned), replayed verbatim by the oracle. Row-local plan:
    * the sign matrix rides in the plan as literals (dOut·dIn doubles —
    * kilobytes), the projection is one Project + posexplode, no shuffle,
    * no UDF, fully codegen'd. */
  def randomProject(embeddings: DataFrame, id: String, vec: String,
                    dOut: Int, dIn: Int): DataFrame = {
    val signs = jlSignMatrix(dOut, dIn)
    val staged = embeddings.select(col(id), asDouble(col(vec)).as("dvec"))
    val projections = array((0 until dOut).map { j =>
      aggregate(
        zip_with(col("dvec"), typedLit(signs(j).toSeq), (x, sgn) => x * sgn),
        lit(0.0), (a, p) => a + p)
    }: _*)
    staged
      .select(col(id), posexplode(projections).as(Seq("out_dim", "proj")))
      .select(col(id), col("out_dim").cast("long").as("out_dim"), col("proj"))
  }
}
