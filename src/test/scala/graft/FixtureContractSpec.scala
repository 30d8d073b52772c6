package graft

import org.apache.spark.sql.types._
import graft.sources.TestData

/** The driver owns `/root/testdata` and HAS regenerated it mid-project with
  * a changed physical type (round 9: `events.ts` went INT64-nanos →
  * TIMESTAMP(MICROS), silently breaking 11 gates while no builder was
  * present to see the suites fire). This spec pins the FIXTURE CONTRACT the
  * engine depends on, so the next regeneration fails `sbt test` with a
  * named cause — table by table, column by column — instead of an
  * analysis-time DIV mismatch three layers deep in a gate query.
  *
  * Deliberately tolerant where history says the driver legitimately varies
  * (timestamp precision, int widths): each column asserts MEMBERSHIP in an
  * accepted type set, and the events `ts` lane additionally asserts the
  * reader's normalization output — the engine-facing contract — rather
  * than one physical encoding.
  */
class FixtureContractSpec extends SparkSpec {

  // column -> acceptable Spark types after a plain parquet read (under the
  // session's nanosAsLong + UTC confs, like every engine session)
  private val longLike: Set[DataType] = Set(LongType, IntegerType)
  private val tsLike: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType, DateType)
  private val floatArr: Set[DataType] =
    Set(ArrayType(FloatType, true), ArrayType(FloatType, false),
      ArrayType(DoubleType, true), ArrayType(DoubleType, false))

  private def checkTable(name: String, expected: Map[String, Set[DataType]]): Unit = {
    val df = TestData(spark, sf0001).spark.read.parquet(s"$sf0001/$name.parquet")
    val bySchema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = expected.keySet.diff(bySchema.keySet)
    assert(missing.isEmpty,
      s"FIXTURE CONTRACT: $name lost column(s) ${missing.mkString(", ")} — " +
        s"driver regenerated the fixtures with a new layout; present: " +
        bySchema.keySet.toSeq.sorted.mkString(", "))
    expected.foreach { case (c, types) =>
      assert(types.contains(bySchema(c)),
        s"FIXTURE CONTRACT: $name.$c is ${bySchema(c)}, expected one of " +
          s"${types.mkString("/")} — adapt the reader (TestData) AND the " +
          "oracle SQL together, then update this spec")
    }
  }

  test("events: physical ts readable, normalized contract (ts_ns + µs ts) holds") {
    checkTable("events", Map(
      "event_id" -> longLike, "user_id" -> longLike,
      "ts" -> tsLike,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType)))
    // the engine-facing contract, independent of the physical encoding
    val ev = TestData(spark, sf0001).events
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    // ts_ns IS nanoseconds of ts: cross-check one derivation vs the other
    import org.apache.spark.sql.functions._
    val bad = ev.filter(unix_micros(col("ts")) * lit(1000L) =!= col("ts_ns"))
      .count()
    assert(bad == 0, s"$bad rows where ts_ns disagrees with ts at µs precision")
  }

  test("TPC-H tables keep the columns and key types the gates scan") {
    checkTable("lineitem", Map(
      "l_orderkey" -> longLike, "l_partkey" -> longLike,
      "l_suppkey" -> longLike, "l_linenumber" -> longLike,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> tsLike))
    checkTable("orders", Map(
      "o_orderkey" -> longLike, "o_custkey" -> longLike,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> tsLike, "o_orderpriority" -> Set(StringType)))
    checkTable("customer", Map("c_custkey" -> longLike,
      "c_nationkey" -> longLike, "c_mktsegment" -> Set(StringType)))
    checkTable("supplier", Map("s_suppkey" -> longLike,
      "s_nationkey" -> longLike, "s_name" -> Set(StringType),
      "s_acctbal" -> Set(DoubleType)))
    checkTable("part", Map("p_partkey" -> longLike,
      "p_name" -> Set(StringType), "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType), "p_size" -> longLike,
      "p_retailprice" -> Set(DoubleType)))
    checkTable("nation", Map("n_nationkey" -> longLike,
      "n_name" -> Set(StringType), "n_regionkey" -> longLike))
    checkTable("region", Map("r_regionkey" -> longLike,
      "r_name" -> Set(StringType)))
  }

  test("documents + embeddings keep the corpus-lane contract") {
    checkTable("documents", Map(
      "doc_id" -> longLike, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> longLike))
    checkTable("embeddings", Map(
      "vec_id" -> longLike, "embedding" -> floatArr,
      "label" -> (longLike + StringType)))
    // dimension stability: every ANN gate assumes 64-dim vectors
    import org.apache.spark.sql.functions._
    val dims = TestData(spark, sf0001).embeddings
      .select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64),
      s"FIXTURE CONTRACT: embedding dims ${dims.mkString(",")} != 64 — " +
        "every m/dsub parameter in the ANN gates assumes 64")
  }
}
