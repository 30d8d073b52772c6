package graft.sources.v2

import java.time.LocalDate
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the deterministic synthetic market
  * (SURVEY.md §2.1 S1 "custom DataSourceV2 if a live connector is wanted").
  *
  * ```
  * spark.read.format("graft.sources.v2.SyntheticMarketSource")
  *   .option("nSymbols", 100).option("nDays", 500)
  *   .option("startDate", "2020-01-01").option("seed", 42).load()
  * ```
  *
  * Demonstrates the three scan-side contracts that matter at 100 TB:
  *  - `planInputPartitions`: symbols are split into ranges → one reader per
  *    range, fully parallel generation with zero driver data;
  *  - `SupportsPushDownRequiredColumns`: only requested columns are built;
  *  - `SupportsPushDownFilters`: symbol equality and date bounds shrink the
  *    generated (symbol × day) grid at the source, before any rows exist.
  *
  * Every value is a pure function of (seed, symbol index, day index) — the
  * same contract as [[graft.sources.SyntheticMarket]], generator-side.
  */
class SyntheticMarketSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticMarketSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticMarketSource {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** xxhash-style mix (splitmix64 finalizer) — deterministic, allocation-free. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def unit(seed: Long, a: Long, b: Long): Double =
    math.floorMod(mix(mix(seed ^ a) ^ b), 1000000L).toDouble / 1000000.0
}

final class SynTable(opts: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "synthetic_market"
  override def schema(): StructType = SyntheticMarketSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](opts)
    merged.putAll(options)
    new SynScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class SynScanBuilder(opts: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SyntheticMarketSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var symbolEq: Option[String] = None
  private var minDate: Option[LocalDate] = None
  private var maxDate: Option[LocalDate] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asDate(v: Any): Option[LocalDate] = v match {
      case d: java.sql.Date => Some(d.toLocalDate)
      case d: LocalDate => Some(d)
      case _ => None
    }
    val (accepted, rejected) = filters.partition {
      case EqualTo("symbol", _: String) => true
      case GreaterThan("date", v) => asDate(v).isDefined
      case GreaterThanOrEqual("date", v) => asDate(v).isDefined
      case LessThan("date", v) => asDate(v).isDefined
      case LessThanOrEqual("date", v) => asDate(v).isDefined
      case _ => false
    }
    accepted.foreach {
      case EqualTo("symbol", s: String) => symbolEq = Some(s)
      case GreaterThan("date", v) => asDate(v).foreach(d => minDate = Some(d.plusDays(1)))
      case GreaterThanOrEqual("date", v) => asDate(v).foreach(d => minDate = Some(d))
      case LessThan("date", v) => asDate(v).foreach(d => maxDate = Some(d.minusDays(1)))
      case LessThanOrEqual("date", v) => asDate(v).foreach(d => maxDate = Some(d))
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies these; accepted ones are source-guaranteed
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SynScan(
    seed = opts.getLong("seed", 42L),
    nSymbols = opts.getInt("nSymbols", 100),
    nDays = opts.getInt("nDays", 500),
    startDate = LocalDate.parse(Option(opts.get("startDate")).getOrElse("2020-01-01")),
    required = required, symbolEq = symbolEq, minDate = minDate, maxDate = maxDate)
}

final case class SynPartition(symStart: Int, symEnd: Int) extends InputPartition

final class SynScan(seed: Long, nSymbols: Int, nDays: Int, startDate: LocalDate,
                    required: StructType, symbolEq: Option[String],
                    minDate: Option[LocalDate], maxDate: Option[LocalDate])
  extends Scan with Batch with Serializable {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // symbol-equality pushdown: plan exactly one symbol's range
    val (lo, hi) = symbolEq.flatMap(SynScan.symbolIndex(_, nSymbols)) match {
      case Some(i) => (i, i + 1)
      case None if symbolEq.isDefined => (0, 0) // unknown symbol → empty
      case None => (0, nSymbols)
    }
    val slices = 8
    val step = math.max(1, math.ceil((hi - lo) / slices.toDouble).toInt)
    (lo until hi by step).map(s => SynPartition(s, math.min(s + step, hi))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val (sd, sdEpoch) = (startDate, startDate.toEpochDay)
    val dayLo = minDate.map(d => math.max(0L, d.toEpochDay - sdEpoch)).getOrElse(0L).toInt
    val dayHi = maxDate.map(d => math.min(nDays - 1L, d.toEpochDay - sdEpoch)).getOrElse(nDays - 1L).toInt
    val (s, req) = (seed, required.fieldNames.toSeq)
    val _ = sd
    (partition: InputPartition) => new SynReader(
      partition.asInstanceOf[SynPartition], s, sdEpoch, dayLo, dayHi, req)
  }
}

object SynScan {
  /** `000042.SZ` / `000043.SS` ↔ index (even → SZ, odd → SS, as in
    * SyntheticMarket). */
  def symbolIndex(symbol: String, nSymbols: Int): Option[Int] = {
    val base = symbol.takeWhile(_ != '.')
    base.toIntOption.filter(i => i >= 0 && i < nSymbols)
      .filter { i =>
        val suffix = if (i % 2 == 0) ".SZ" else ".SS"
        symbol == f"$i%06d$suffix"
      }
  }
  def symbolName(i: Int): String = f"$i%06d" + (if (i % 2 == 0) ".SZ" else ".SS")
}

final class SynReader(p: SynPartition, seed: Long, startEpochDay: Long,
                      dayLo: Int, dayHi: Int, required: Seq[String])
  extends PartitionReader[InternalRow] {
  import SyntheticMarketSource.unit

  private var sym = p.symStart
  private var day = dayLo - 1
  private val row = new GenericInternalRow(required.length)

  override def next(): Boolean = {
    day += 1
    if (day > dayHi) { day = dayLo; sym += 1 }
    if (sym >= p.symEnd || dayLo > dayHi) return false
    var i = 0
    while (i < required.length) {
      required(i) match {
        case "symbol" => row.update(i, UTF8String.fromString(SynScan.symbolName(sym)))
        case "date"   => row.update(i, (startEpochDay + day).toInt)
        case "close"  => row.update(i,
          10.0 * (1.0 + unit(seed, sym, -1L) * 10.0) * (1.0 + (unit(seed, sym, day) - 0.5) * 0.1))
        case "volume" => row.update(i,
          if (unit(seed, sym, day + 1000000L) < 0.02) 0.0
          else math.floor(unit(seed, sym, day + 2000000L) * 1e6))
      }
      i += 1
    }
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
