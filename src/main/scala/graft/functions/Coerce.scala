package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C2/C3/C5 — type-coercion helpers mirroring the reference's pandas
  * semantics (unified_fetcher.py:137-143, data_converter.py:87-110,315).
  * With ANSI mode off, `cast` yields null on failure — exactly
  * `pd.to_numeric(errors="coerce")`.
  */
object Coerce {

  /** Coerce the named columns to double, nulling unparseable values (C3). */
  def toDouble(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))

  /** Deliberate float32 downcast used for adjust factors (C5,
    * data_converter.py:315). */
  def toFloat32(c: Column): Column = c.cast("float")

  /** C2 — `YYYYMMDD` int/string ↔ date conversions
    * (data_converter.py:353-356, ptrade_data_api.py:330-333). */
  def dateToInt(d: Column): Column   = date_format(d, "yyyyMMdd").cast("int")
  def intToDate(i: Column): Column   = to_date(i.cast("string"), "yyyyMMdd")
  def parseCompact(s: Column): Column = to_date(s, "yyyyMMdd")

  /** Midnight truncation — pandas `.normalize()` (data_converter.py:92-93);
    * the true grain of the reference is the date. */
  def normalize(ts: Column): Column = to_date(ts)

  /** Engine-portable half-up rounding for non-negative values:
    * floor(x·10^s + 0.5)/10^s. Unlike `round`, every step is an exact IEEE
    * op on identical inputs, so two engines can never disagree on boundary
    * values (Spark rounds the decimal expansion of the double, DuckDB the
    * scaled double — they differ exactly on the .xx5 lattice that financial
    * prices live on). */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * p + 0.5) / p
  }
}
