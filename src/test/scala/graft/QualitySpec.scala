package graft

import org.apache.spark.sql.functions._
import graft.api.PTradeApi
import graft.domain.MarketViews
import graft.quality.DataQuality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val views = MarketViews(spark, sf0001)

  test("derived bars satisfy the §5.4 invariants by construction") {
    val inv = DataQuality.barInvariants(views.bars, views.calendar).cache()
    val s = DataQuality.summarize(inv).head()
    assert(s.getAs[Long]("null_ohlc") == 0)
    assert(s.getAs[Long]("lo_gt_hi") == 0)
    assert(s.getAs[Long]("ooh_range") == 0)
    assert(s.getAs[Long]("nonpos_volume") == 0)
    // calendar gaps are expected (symbols don't trade every day) but never negative
    assert(inv.filter(col("calendar_gaps") < 0).count() == 0)
  }

  test("null profile counts missing values per column") {
    val df = Seq((Some(1.0), None: Option[Double]), (None, Some(2.0)), (Some(3.0), Some(4.0)))
      .toDF("a", "b")
    val p = DataQuality.nullProfile(df, Seq("a", "b")).head()
    assert(p.getAs[Long]("n_rows") == 3)
    assert(p.getAs[Long]("a_nulls") == 1)
    assert(p.getAs[Long]("b_nulls") == 1)
  }

  test("observed: in-flight metrics see the full flow with no second scan; downstream filter doesn't shrink them") {
    val df = Seq((Some(1.0), "a"), (None, "b"), (Some(3.0), "c"), (None, "d"))
      .toDF("x", "s")
    val (tapped, obs) = DataQuality.observed(df, "dq_tap", Seq("x"))
    // the consuming action FILTERS; the tap still counts every row that
    // flowed through the observe point
    val kept = tapped.filter(col("x").isNotNull).count()
    assert(kept == 2L)
    val m = obs.get
    assert(m("n_rows") == 4L && m("x_nulls") == 2L, m.toString)
  }

  test("expectations: valid/quarantine split, null checks fail closed, reasons in declaration order") {
    import graft.quality.Expectations
    val df = Seq(
      (1L, Some(10.0), "ok"),
      (2L, Some(99.0), "too big"),
      (3L, None: Option[Double], "null fails closed"),
      (4L, Some(-1.0), "negative")).toDF("id", "x", "note")
    val checks = Seq(
      "x_max" -> (col("x") <= 50.0),
      "x_pos" -> (col("x") >= 0.0))
    val root = java.nio.file.Files.createTempDirectory("graft_exp").toString
    val r = Expectations.writeWithExpectations(df, s"$root/ok", s"$root/bad", checks)
    assert(r == Expectations.Result(1L, 3L))
    val ok = spark.read.parquet(s"$root/ok").select("id").as[Long].collect()
    assert(ok.toSeq == Seq(1L))
    val bad = spark.read.parquet(s"$root/bad")
      .select("id", "__violations").as[(Long, String)].collect().toMap
    assert(bad == Map(2L -> "x_max", 3L -> "x_max,x_pos", 4L -> "x_pos"))
  }

  test("compression ratio: repetition compresses below prose, noise above; empty is null") {
    val rep = ("spam " * 200).trim
    val prose = "the quick brown fox jumps over the lazy dog and then reflects " +
      "on market microstructure while the window function partitions quietly " +
      "across a wide executor fleet near the shuffle boundary every evening"
    val noise = new scala.util.Random(7).alphanumeric.take(600).mkString
    val df = Seq((1L, rep), (2L, prose), (3L, noise), (4L, ""))
      .toDF("id", "text")
    val got = DataQuality.compressionRatio(df, "text")
      .select("id", "compress_ratio")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(4L).isEmpty)
    val (r, p, n) = (got(1L).get, got(2L).get, got(3L).get)
    assert(r < p && p < n, s"ordering violated: rep=$r prose=$p noise=$n")
    assert(r < 0.1 && n > 0.5, s"tails out of band: rep=$r noise=$n")
    assert(got.values.flatten.forall(v => v > 0.0 && v < 1.5))
  }

  test("benford audit: hand-counted digits, absent digits report zero, grid sums to 1000") {
    assert(DataQuality.BenfordPm.map(_._2).sum == 1000L)
    // values: first digits 1,1,1,2,9 — digit 3..8 absent; 0.5 contributes
    // its first SIGNIFICANT digit (5)
    val df = Seq(123.0, 1.9, 0.5, 19999.0, 2.2, 9.0).toDF("x")
    val rows = DataQuality.benfordAudit(df, col("x"))
      .select("digit", "n_obs", "expected_pm", "dev")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.size == 9)
    assert(rows(1L)._2 == 3L && rows(2L)._2 == 1L && rows(5L)._2 == 1L &&
      rows(9L)._2 == 1L && rows(3L)._2 == 0L)
    // dev = 1000·obs − pm·N with N = 6: digit 1 → 3000 − 301·6 = 1194
    assert(rows(1L)._4 == 1194L)
    assert(rows(3L)._4 == -125L * 6L)
  }

  test("pivot (matrix edge) round-trips back to the long shape") {
    val api = PTradeApi(views)
    val syms = Seq("000001.SZ", "000002.SZ", "000003.SZ")
    val long = api.getPrice(syms, "1996-01-01", "1996-06-30", Seq("close"))
    val m = api.toMatrix(long, "close", syms)
    // unpivot: stack the symbol columns back into (date, symbol, close)
    val back = m.selectExpr("date",
        s"stack(${syms.length}, ${syms.map(s => s"'$s', `$s`").mkString(", ")}) AS (symbol, close)")
      .filter(col("close").isNotNull)
    assert(back.select("date", "symbol", "close").exceptAll(long.select("date", "symbol", "close")).isEmpty)
    assert(long.select("date", "symbol", "close").exceptAll(back.select("date", "symbol", "close")).isEmpty)
  }

  test("tableDigest: order/partitioning-invariant, value- and null-sensitive") {
    val base = Seq((1L, "a", Option("x")), (2L, "b", Option("y")),
      (3L, "c", None)).toDF("k", "s", "v")
    val cols = Seq("k", "s", "v")
    def dig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = DataQuality.tableDigest(df, cols).head()
      (r.getLong(0), r.getLong(1))
    }
    val d0 = dig(base)
    // multiset identity survives any reordering / repartitioning
    assert(dig(base.orderBy(col("k").desc)) == d0)
    assert(dig(base.repartition(7, col("s"))) == d0)
    // one changed value changes the digest; row count unchanged
    val d1 = dig(base.withColumn("v",
      when(col("k") === 1L, lit("X")).otherwise(col("v"))))
    assert(d1._1 == d0._1 && d1._2 != d0._2)
    // NULL is distinct from every rendered string (incl. "null" and "")
    val dNullStr = dig(base.withColumn("v",
      when(col("k") === 3L, lit("null")).otherwise(col("v"))))
    val dEmpty = dig(base.withColumn("v",
      when(col("k") === 3L, lit("")).otherwise(col("v"))))
    assert(dNullStr._2 != d0._2 && dEmpty._2 != d0._2 && dNullStr._2 != dEmpty._2)
    // length-prefixing: boundary shifts across fields don't collide
    val a = dig(Seq(("ab", "c")).toDF("s", "v").select(col("s"), col("v"), lit(1L).as("k"))
      .select("k", "s", "v"))
    val b = dig(Seq(("a", "bc")).toDF("s", "v").select(col("s"), col("v"), lit(1L).as("k"))
      .select("k", "s", "v"))
    assert(a._2 != b._2)
    // a duplicated row changes the digest (multiset, not set, semantics)
    val dDup = dig(base.union(base.limit(1)))
    assert(dDup._1 == d0._1 + 1 && dDup._2 != d0._2)
  }
}
