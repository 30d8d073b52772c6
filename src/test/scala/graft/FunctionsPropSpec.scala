package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{CodeConvert, Coerce, TextFns}

/** Property tests for the scalar-function layer (SURVEY.md §5 rebuild plan):
  * code-conversion round-trip, date int round-trip, text measures.
  * (Raw ScalaCheck generators with fixed seeds — the scalatest bridge
  * artifact isn't in the offline cache.) */
class FunctionsPropSpec extends SparkSpec {
  import spark.implicits._

  private val bareCode: Gen[String] =
    Gen.listOfN(6, Gen.numChar).map(_.mkString)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("PTrade→BaoStock→PTrade round-trips for every inferable code") {
    val codes = (0 until 10).flatMap(i => sample(Gen.listOfN(30, bareCode), 42L + i))
    val df = codes.toDF("bare")
      .withColumn("pt", CodeConvert.inferPtrade(col("bare")))
      .withColumn("back", CodeConvert.baostockToPtrade(CodeConvert.ptradeToBaostock(col("pt"))))
    val bad = df.filter(col("pt").isNotNull && (col("back").isNull || col("back") =!= col("pt"))).count()
    assert(bad == 0)
    // and at least some codes are inferable at all
    assert(df.filter(col("pt").isNotNull).count() > 0)
  }

  test("bare→PTrade→bare round-trips; SH legacy suffix tolerated") {
    val codes = (0 until 5).flatMap(i => sample(Gen.listOfN(30, bareCode), 7L + i))
    val df = codes.toDF("bare")
      .withColumn("pt", CodeConvert.inferPtrade(col("bare")))
      .withColumn("back", CodeConvert.ptradeToBare(col("pt")))
    assert(df.filter(col("pt").isNotNull && col("back") =!= col("bare")).count() == 0)
    val sh = Seq("600000.SH").toDF("c")
      .select(CodeConvert.ptradeToBaostock(col("c")).as("b")).head().getString(0)
    assert(sh == "sh.600000")
  }

  test("date ↔ int YYYYMMDD round-trips") {
    val dates = Seq("1995-01-01", "2000-02-29", "2024-12-31").toDF("s")
      .withColumn("d", to_date(col("s")))
    val bad = dates
      .withColumn("i", Coerce.dateToInt(col("d")))
      .withColumn("back", Coerce.intToDate(col("i")))
      .filter(col("back") =!= col("d")).count()
    assert(bad == 0)
  }

  test("coercion nulls unparseable numerics (ANSI off)") {
    val out = Seq("1.5", "x", "", "2").toDF("v")
    val coerced = Coerce.toDouble(out, Seq("v")).as[Option[Double]].collect().toSeq
    assert(coerced == Seq(Some(1.5), None, None, Some(2.0)))
  }

  test("word measures agree with Scala reference implementation") {
    (0 until 10).foreach { i =>
      val words = sample(Gen.listOfN(8, Gen.alphaLowerStr.suchThat(_.nonEmpty)), 7L + i)
      val text = words.mkString(" ")
      val row = Seq(text).toDF("t").select(
        TextFns.wordCount(col("t")).as("n"),
        TextFns.totalWordChars(col("t")).as("c")).head()
      assert(row.getInt(0) == words.length)
      assert(row.getInt(1) == words.map(_.length).sum)
    }
  }
}
