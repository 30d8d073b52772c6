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
}
