package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** C1 — security-code conversion between PTrade (`600000.SS` / `000001.SZ`)
  * and BaoStock (`sh.600000` / `sz.000001`) formats, plus bare-code market
  * inference — pure column expressions, fully codegen'd (no UDF), after
  * utils/code_utils.py:9-94 in the reference.
  */
object CodeConvert {

  /** `600000.SS` → `sh.600000`; `000001.SZ` → `sz.000001`. The legacy `SH`
    * suffix is tolerated like the reference's market_map (code_utils.py:85).
    * Unknown suffix → null. */
  def ptradeToBaostock(code: Column): Column = {
    val base   = substring_index(code, ".", 1)
    val market = substring_index(code, ".", -1)
    when(market === "SS" || market === "SH", concat(lit("sh."), base))
      .when(market === "SZ", concat(lit("sz."), base))
      .otherwise(lit(null))
  }

  /** PTrade → bare 6-digit code — the qstock/mootdx target format
    * (code_utils.py:88-90); inverse of [[inferPtrade]] for valid codes.
    * The yahoo target is the identity (same `.SS`/`.SZ` suffixes). */
  def ptradeToBare(code: Column): Column = substring_index(code, ".", 1)

  /** `sh.600000` → `600000.SS`; `sz.000001` → `000001.SZ`. Unknown prefix → null. */
  def baostockToPtrade(code: Column): Column = {
    val market = substring_index(code, ".", 1)
    val base   = substring_index(code, ".", -1)
    when(market === "sh", concat(base, lit(".SS")))
      .when(market === "sz", concat(base, lit(".SZ")))
      .otherwise(lit(null))
  }

  /** Bare 6-digit code → PTrade suffix by market inference: first char
    * 6/5/9 → Shanghai, 0/2/3 → Shenzhen (code_utils.py:54-94). */
  def inferPtrade(bare: Column): Column = {
    val first = substring(bare, 1, 1)
    when(first.isin("6", "5", "9"), concat(bare, lit(".SS")))
      .when(first.isin("0", "2", "3"), concat(bare, lit(".SZ")))
      .otherwise(lit(null))
  }

  /** F2 — index-code predicate: `sh.000*` / `sz.399*` are indices, not stocks
    * (ptrade_data_api.py:121-122, baostock_fetcher.py:98-102). */
  def isIndexCode(baostockCode: Column): Column =
    baostockCode.rlike("^(sh\\.000|sz\\.399)")
}
