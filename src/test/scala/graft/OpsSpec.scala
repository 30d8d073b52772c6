package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Joins, Windows}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches latest right row at or before left time, per key") {
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (2, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 10L, 100.0), (1, 15L, 150.0), (2, 9L, 900.0))
      .toDF("k", "rt", "v")
    val out = Joins.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "tag", "v").as[(Int, String, Option[Double])].collect().toSet
    // l1: right@10 (<=, inclusive); l2: right@15; l3: nothing at or before 5
    assert(out == Set((1, "l1", Some(100.0)), (1, "l2", Some(150.0)), (2, "l3", None)))
  }

  test("asOf attaches a newer right row even when its payload is null") {
    val left = Seq((1, 20L, "l")).toDF("k", "t", "tag")
    val right = Seq((1, 10L, Some(5.0)), (1, 15L, None)).toDF("k", "rt", "v")
    val out = Joins.asOf(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].head()
    // the as-of-latest right row (t=15) has v=null; an implementation that
    // forward-fills the payload FIELD would wrongly return 5.0
    assert(out == (("l", None)))
  }

  test("asOfTolerance nulls out matches older than the staleness bound") {
    val left = Seq((1, 100L, "fresh"), (1, 200L, "stale"), (1, 40L, "exact"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 40L, 4.0)).toDF("k", "rt", "v")
    val out = Joins.asOfTolerance(left, right, Seq("k"), "t", "rt", Seq("v"),
        Some(lit(70L)))
      .select("tag", "v").as[(String, Option[Double])].collect().toSet
    // t=40: gap 0 ≤ 70 → match; t=100: gap 60 ≤ 70 → match;
    // t=200: gap 160 > 70 → the forward-filled match nulls OUT
    assert(out == Set(("exact", Some(4.0)), ("fresh", Some(4.0)), ("stale", None)))
    // None tolerance ≡ plain asOf (the stale row keeps its fill)
    val plain = Joins.asOfTolerance(left, right, Seq("k"), "t", "rt", Seq("v"), None)
      .select("tag", "v").as[(String, Option[Double])].collect().toSet
    assert(plain == Set(("exact", Some(4.0)), ("fresh", Some(4.0)), ("stale", Some(4.0))))
  }

  test("asOfForward attaches earliest right row at or after left time, per key") {
    val left = Seq((1, 10L, "l1"), (1, 20L, "l2"), (2, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 10L, 100.0), (1, 15L, 150.0), (2, 3L, 900.0))
      .toDF("k", "rt", "v")
    val out = Joins.asOfForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "tag", "v").as[(Int, String, Option[Double])].collect().toSet
    // l1: right@10 (>=, inclusive — NOT right@15); l2: nothing at or
    // after 20; l3: right@3 is in the past → no match
    assert(out == Set((1, "l1", Some(100.0)), (1, "l2", None), (2, "l3", None)))
  }

  test("asOfForward tolerance bounds how far ahead a match may sit") {
    val left = Seq((1, 10L, "near"), (1, 80L, "far"), (1, 100L, "exact"))
      .toDF("k", "t", "tag")
    val right = Seq((1, 100L, 7.0)).toDF("k", "rt", "v")
    val out = Joins.asOfForward(left, right, Seq("k"), "t", "rt", Seq("v"),
        Some(lit(30L)))
      .select("tag", "v").as[(String, Option[Double])].collect().toSet
    // t=100: gap 0 ≤ 30 → match; t=80: gap 20 ≤ 30 → match;
    // t=10: gap 90 > 30 → the filled match nulls OUT
    assert(out == Set(("exact", Some(7.0)), ("far", Some(7.0)), ("near", None)))
  }

  test("rollingCorr: ±1 on perfectly (anti)correlated frames, null on degenerate") {
    // x ascending; y = 2x (corr +1) for key a, y = -x (corr −1) for key b
    val df = (1 to 6).flatMap(i => Seq(
      ("a", i.toLong, i.toDouble, 2.0 * i),
      ("b", i.toLong, i.toDouble, -i.toDouble))).toDF("k", "t", "x", "y")
    val out = Windows.rollingCorr(df, Seq(col("k")), Seq(col("t")),
        col("x"), col("y"), 3, "c")
      .filter(col("t") >= 3).select("k", "t", "c")
      .as[(String, Long, Double)].collect()
    assert(out.filter(_._1 == "a").forall(r => math.abs(r._3 - 1.0) < 1e-12))
    assert(out.filter(_._1 == "b").forall(r => math.abs(r._3 + 1.0) < 1e-12))
    // 1-row frame and zero-variance series → null, not NaN/divide-by-zero
    val deg = Seq(("c", 1L, 1.0, 5.0), ("c", 2L, 1.0, 7.0))
      .toDF("k", "t", "x", "y")
    val dc = Windows.rollingCorr(deg, Seq(col("k")), Seq(col("t")),
        col("x"), col("y"), 3, "c")
      .select("c").collect().map(r => r.isNullAt(0))
    assert(dc.forall(identity), "constant-x frames must yield null corr")
  }

  test("rollingZscore: hand-checked value, threshold verdict, degenerate null") {
    // frame [1,1,1,9] at t=4 (n=4): sx=12, sxx=84, mean=3, popstd=sqrt(12)
    // z = (9·4 − 12)/sqrt(4·84 − 144) = 24/sqrt(192) = sqrt(3) ≈ 1.732
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 9.0))
      .toDF("k", "t", "x")
    val out = Windows.rollingZscore(df, Seq(col("k")), Seq(col("t")),
        col("x"), 4, 2.0, "z")
      .filter(col("t") === 4).select("z", "z_outlier")
      .as[(Double, Boolean)].head()
    assert(math.abs(out._1 - math.sqrt(3.0)) < 1e-12)
    assert(!out._2, "z=1.73 is under k=2")
    // same spike with k=1.5 flips the verdict
    val hot = Windows.rollingZscore(df, Seq(col("k")), Seq(col("t")),
        col("x"), 4, 1.5, "z")
      .filter(col("t") === 4).select("z_outlier").as[Boolean].head()
    assert(hot, "z=1.73 exceeds k=1.5")
    // constant frames → null z, false flag (never NaN)
    val deg = Windows.rollingZscore(
        Seq(("c", 1L, 5.0), ("c", 2L, 5.0)).toDF("k", "t", "x"),
        Seq(col("k")), Seq(col("t")), col("x"), 3, 2.0, "z")
      .select("z", "z_outlier").collect()
    assert(deg.forall(r => r.isNullAt(0) && !r.getBoolean(1)))
  }

  test("asOfNearest: nearer side wins, ties go backward, tolerance nulls both") {
    val l = Seq((1L, 100L, "a"), (1L, 205L, "b"), (1L, 400L, "c"), (2L, 50L, "d"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L, 9.0), (1L, 210L, 21.0), (1L, 110L, 11.0))
      .toDF("k", "rt", "v")
    val out = Joins.asOfNearest(l, r, Seq("k"), "t", "rt", Seq("v"),
        Some(lit(50L)))
      .select("tag", "v", "matched_side")
      .as[(String, Option[Double], Option[String])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // a@100: back 90 (d=10) vs fwd 110 (d=10) — TIE -> back
    assert(out("a") == ((Some(9.0), Some("back"))))
    // b@205: back 110 (d=95, out of tol) vs fwd 210 (d=5) -> fwd
    assert(out("b") == ((Some(21.0), Some("fwd"))))
    // c@400: nearest is 210, d=190 > 50 -> null both ways
    assert(out("c") == ((None, None)))
    // d@key 2: no right rows at all
    assert(out("d") == ((None, None)))
  }

  test("upsert keeps the preferred (last-wins) row per key") {
    val existing = Seq((1, "old"), (2, "old")).toDF("k", "v").withColumn("batch", lit(0))
    val incoming = Seq((2, "new"), (3, "new")).toDF("k", "v").withColumn("batch", lit(1))
    val out = Joins.upsert(existing, incoming, Seq("k"), Seq(col("batch")))
      .select("k", "v").as[(Int, String)].collect().toSet
    assert(out == Set((1, "old"), (2, "new"), (3, "new")))
  }

  test("upsert is idempotent (re-applying the same increment changes nothing)") {
    val existing = Seq((1, "a"), (2, "b")).toDF("k", "v").withColumn("batch", lit(0))
    val incoming = Seq((2, "b2")).toDF("k", "v").withColumn("batch", lit(1))
    val once = Joins.upsert(existing, incoming, Seq("k"), Seq(col("batch")))
    val twice = Joins.upsert(once, incoming, Seq("k"), Seq(col("batch")))
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
  }

  test("fillForward carries last non-null observation; leading nulls stay null") {
    val df = Seq((1, 1, Some(10.0)), (1, 2, None), (1, 3, None), (1, 4, Some(40.0)),
                 (2, 1, None), (2, 2, Some(2.0)))
      .toDF("k", "t", "v")
    val out = Windows.fillForward(df, Seq(col("k")), Seq(col("t")), Seq("v"))
      .as[(Int, Int, Option[Double])].collect().toSet
    assert(out == Set((1, 1, Some(10.0)), (1, 2, Some(10.0)), (1, 3, Some(10.0)),
      (1, 4, Some(40.0)), (2, 1, None), (2, 2, Some(2.0))))
  }

  test("fillForward is idempotent") {
    val df = Seq((1, 1, Some(1.0)), (1, 2, None)).toDF("k", "t", "v")
    val once = Windows.fillForward(df, Seq(col("k")), Seq(col("t")), Seq("v"))
    val twice = Windows.fillForward(once, Seq(col("k")), Seq(col("t")), Seq("v"))
    assert(once.orderBy("t").collect().toSeq == twice.orderBy("t").collect().toSeq)
  }

  test("lastNPerKey returns the n most recent rows per key") {
    val df = Seq((1, 1), (1, 2), (1, 3), (2, 1)).toDF("k", "t")
    val out = Windows.lastNPerKey(df, Seq(col("k")), Seq(col("t")), 2)
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 3), (1, 2), (2, 1)))
  }

  test("resampleBars computes first/max/min/last/sum per period") {
    val df = Seq(
      ("s", "2024-01-01", 1L, 10.0, 100.0),
      ("s", "2024-01-01", 2L, 30.0, 100.0),
      ("s", "2024-01-01", 3L, 5.0, 100.0),
      ("s", "2024-01-02", 4L, 7.0, 50.0)
    ).toDF("sym", "d", "seq", "px", "vol")
    val out = Aggregates.resampleBars(df, Seq(col("sym")), col("d"), Seq(col("seq")),
        col("px"), col("vol"), col("px") * col("vol"))
      .orderBy("period").collect()
    val day1 = out(0)
    assert(day1.getAs[Double]("open") == 10.0)
    assert(day1.getAs[Double]("high") == 30.0)
    assert(day1.getAs[Double]("low") == 5.0)
    assert(day1.getAs[Double]("close") == 5.0)
    assert(day1.getAs[Double]("volume") == 300.0)
    assert(day1.getAs[Long]("n_rows") == 3L)
  }

  test("cumProduct matches exact running product within double tolerance") {
    val df = Seq(("s", 1, 1.1), ("s", 2, 0.9), ("s", 3, 1.25), ("s", 4, 2.0))
      .toDF("sym", "t", "f")
    val out = Aggregates.cumProduct(df, Seq(col("sym")), Seq(col("t")), col("f"), "cp")
      .orderBy("t").select("cp").as[Double].collect()
    val expected = Seq(1.1, 1.1 * 0.9, 1.1 * 0.9 * 1.25, 1.1 * 0.9 * 1.25 * 2.0)
    out.zip(expected).foreach { case (a, e) => assert(math.abs(a - e) < 1e-12 * e) }
  }

  test("rollingSlope: exact line recovers its slope; constant x is null") {
    import graft.ops.Windows
    // y = 2x + 1 over x = 1..5: every ≥2-point frame has slope exactly 2
    val line = (1 to 5).map(i => ("k", i, i.toDouble, 2.0 * i + 1))
      .toDF("k", "t", "x", "y")
    val got = Windows.rollingSlope(line, Seq(col("k")), Seq(col("t")),
        col("x"), col("y"), 3, "b").orderBy("t")
      .select("b").as[Option[Double]].collect()
    assert(got(0).isEmpty, "1-point frame has no slope")
    got.drop(1).foreach(b => assert(b.contains(2.0), s"slope drifted: $b"))
    // zero x-variance frame → null
    val const = Seq(("k", 1, 5.0, 1.0), ("k", 2, 5.0, 9.0)).toDF("k", "t", "x", "y")
    val cb = Windows.rollingSlope(const, Seq(col("k")), Seq(col("t")),
        col("x"), col("y"), 3, "b")
      .select("b").as[Option[Double]].collect()
    assert(cb.forall(_.isEmpty))
  }

  test("ksTest: identical samples D=0; disjoint samples D=1; verdicts flip") {
    import graft.ops.Quantiles
    def df(vals: Double*) = vals.map(Tuple1(_)).toDF("v")
    val same = Quantiles.ksTest(df(1, 2, 3), df(1, 2, 3), "v")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(same === ((3L, 3L, 0L, 0.0, false)))
    // A entirely below B: at v=2 cumA=2, cumB=0 → |2·2 − 0·2| = 4 = n_a·n_b.
    // NB even D=1 is NOT significant at n=2 (16 < 1.844164·4·4 ≈ 29.5 —
    // the exact two-sample p here is 1/3): the verdict respects power,
    // it doesn't just threshold D
    val far = Quantiles.ksTest(df(1, 2), df(3, 4), "v")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(far === ((2L, 2L, 4L, 1.0, false)),
      s"D=1 at n=2 must stay under the critical value: $far")
    // at n=10 the same full separation IS significant (10000 > 3688)
    val powered = Quantiles.ksTest(df((1 to 10).map(_.toDouble): _*),
        df((11 to 20).map(_.toDouble): _*), "v")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(powered === ((10L, 10L, 100L, 1.0, true)))
    // shared values count into both CDFs at the same point
    val mixed = Quantiles.ksTest(df(1, 2), df(2, 3), "v")
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(mixed._3 === 2L && mixed._4 === 0.5) // max at v=1: |1·2 − 0·2| = 2
  }

  test("snapshotDiff: added/removed/changed verdicts; unchanged keys silent") {
    import graft.ops.Joins
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "p")
    val neu = Seq((1L, "a", 10.0), (2L, "b", 21.0), (4L, "d", 40.0))
      .toDF("k", "s", "p")
    val got = Joins.snapshotDiff(old, neu, Seq("k"), Seq("s", "p"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("intervalOverlapJoin: emit-once across bins ≡ naive overlap join, zero duplicates") {
    import graft.ops.Joins
    // intervals much longer than the bin (span many bins) so a matching
    // pair meets in MANY bins — the emit-once rule must keep exactly one
    val l = (1 to 40).map(i => (i % 3, i, (i * 7L) % 50, (i * 7L) % 50 + 1 + (i % 9) * 4L))
      .toDF("k", "lid", "l_lo", "l_hi")
    val r = (1 to 40).map(i => (i % 3, i, (i * 11L) % 50, (i * 11L) % 50 + 1 + (i % 7) * 5L))
      .toDF("k", "rid", "r_lo", "r_hi")
    val got = Joins.intervalOverlapJoin(l, r, Seq("k"),
        "l_lo", "l_hi", "r_lo", "r_hi", bin = 3L)
      .select("k", "lid", "rid").collect().map(_.toSeq).toSeq
    val naive = l.join(r, "k")
      .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("k", "lid", "rid").collect().map(_.toSeq).toSeq
    assert(got.size == got.distinct.size, "emit-once must leave no duplicates")
    assert(got.sortBy(_.toString) == naive.sortBy(_.toString),
      s"binned overlap join must equal the naive join: ${got.size} vs ${naive.size}")
    assert(naive.nonEmpty && naive.size > 40, "test must exercise real overlap volume")
  }

  test("snapshotDiff digest is collision-free: boundary shifts and null-vs-literal differ") {
    import graft.ops.Joins
    // ("a~b","c") vs ("a","b~c"): same concatenation under any unescaped
    // printable delimiter — the length prefix must split them
    val o1 = Seq((1L, "a~b", "c")).toDF("k", "x", "y")
    val n1 = Seq((1L, "a", "b~c")).toDF("k", "x", "y")
    assert(Joins.snapshotDiff(o1, n1, Seq("k"), Seq("x", "y"))
      .as[(Long, String)].collect().toMap === Map(1L -> "changed"))
    // NULL vs a literal control-char/empty value must not collide with the
    // null sentinel
    val o2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "x")
    val n2 = Seq((1L, Some("\u0000")), (2L, Some(""))).toDF("k", "x")
    assert(Joins.snapshotDiff(o2, n2, Seq("k"), Seq("x"))
      .as[(Long, String)].collect().toMap ===
      Map(1L -> "changed", 2L -> "changed"))
    // and the same content with delimiter-looking bytes stays silent
    val same = Seq((1L, "a\u0001b", "7:x")).toDF("k", "x", "y")
    assert(Joins.snapshotDiff(same, same, Seq("k"), Seq("x", "y")).count() === 0L)
  }

  test("rollingMedian: hand-checked frames; even frames take the LOWER middle") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 1L), ("a", 3L, 4L), ("a", 4L, 2L),
        ("a", 5L, 8L)).toDF("k", "t", "v")
    val m3 = Windows.rollingMedian(df, Seq(col("k")), Seq(col("t")),
        col("v"), 3, "m").orderBy("t").select("m").as[Long].collect().toSeq
    // frames: [5] [1,5] [1,4,5] [1,2,4] [2,4,8]
    assert(m3 == Seq(5L, 1L, 4L, 2L, 4L))
    val m4 = Windows.rollingMedian(df, Seq(col("k")), Seq(col("t")),
        col("v"), 4, "m").orderBy("t").select("m").as[Long].collect().toSeq
    // frames: [5] [1,5] [1,4,5] [1,2,4,5] [1,2,4,8] -- size-4 frames pick
    // element (4+1)/2 = 2 of the sorted list (lower median)
    assert(m4 == Seq(5L, 1L, 4L, 2L, 2L))
  }

  test("slidingDistinct counts the de-duplicated trailing frame") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L), ("a", 4L, 1L),
        ("a", 5L, 3L)).toDF("k", "t", "v")
    val d = Windows.slidingDistinct(df, Seq(col("k")), Seq(col("t")),
        col("v"), 3, "d").orderBy("t").select("d").as[Long].collect().toSeq
    // frames: [1] [1,1] [1,1,2] [1,2,1] [2,1,3]
    assert(d == Seq(1L, 1L, 2L, 2L, 3L))
  }

  test("changeIntervals: islands, half-open bounds, is_current on the last run") {
    val df = Seq(("u", 1L, "a"), ("u", 2L, "a"), ("u", 3L, "b"),
        ("u", 4L, "b"), ("u", 5L, "b"), ("u", 6L, "a")).toDF("k", "t", "v")
    val out = Windows.changeIntervals(df, Seq(col("k")), col("t"), col("v"))
      .select("attr", "valid_from", "valid_to", "n_rows", "is_current")
      .as[(String, Long, Option[Long], Long, Boolean)].collect()
      .sortBy(_._2).toSeq
    // 'a' REAPPEARING after 'b' opens a new island (not merged with run 1)
    assert(out == Seq(
      ("a", 1L, Some(3L), 2L, false),
      ("b", 3L, Some(6L), 3L, false),
      ("a", 6L, None, 1L, true)))
    val one = Seq(("u", 1L, "x"), ("u", 2L, "x")).toDF("k", "t", "v")
    val o1 = Windows.changeIntervals(one, Seq(col("k")), col("t"), col("v"))
      .select("attr", "valid_from", "valid_to", "n_rows", "is_current")
      .as[(String, Long, Option[Long], Long, Boolean)].collect().toSeq
    assert(o1 == Seq(("x", 1L, None, 2L, true)))
  }

  test("streaks: strict rises split on equal values; singles count as length-1 streaks") {
    // u: 1,2,2,3,1,5  → runs [1,2],[2,3],[1,5] = 3 streaks, max 2, last 2
    // v: 5,4,3        → three length-1 runs (every step falls), last 1
    val df = Seq(
      ("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 2.0), ("u", 4L, 3.0),
      ("u", 5L, 1.0), ("u", 6L, 5.0),
      ("v", 1L, 5.0), ("v", 2L, 4.0), ("v", 3L, 3.0)).toDF("k", "t", "x")
    val got = Windows.streaks(df, Seq(col("k")), Seq(col("t")), col("x"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map("u" -> (3L, 2L, 2L), "v" -> (3L, 1L, 1L)))
  }

  test("ewma: O(n) expression matches the recurrence by hand; nulls poison forward") {
    // hand recurrence at alpha=0.25 (exactly representable; rule 1)
    val df = Seq((1, 1L, 4.0), (1, 2L, 8.0), (1, 3L, 2.0), (2, 1L, 10.0))
      .toDF("k", "t", "x")
    val out = Windows.ewma(df, Seq(col("k")), col("t"), col("x"), 0.25, "s")
      .select("k", "o", "s").as[(Int, Long, Double)].collect().toSet
    val s2 = 8.0 * 0.25 + 4.0 * 0.75           // 5.0
    val s3 = 2.0 * 0.25 + s2 * 0.75            // 4.25
    assert(out == Set((1, 1L, 4.0), (1, 2L, s2), (1, 3L, s3), (2, 1L, 10.0)))

    // a null value poisons its own and every LATER output for the key
    // (the state goes null and never recovers — the old fold's contract)
    val withNull = Seq((1, 1L, Some(4.0)), (1, 2L, None), (1, 3L, Some(2.0)))
      .toDF("k", "t", "x")
    val got = Windows.ewma(withNull, Seq(col("k")), col("t"), col("x"), 0.25, "s")
      .select("o", "s").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(1L -> Some(4.0), 2L -> None, 3L -> None))

    // long-history smoke: 100k events on ONE key completes fast and the
    // final state matches a driver-side fold (the O(n^2) concat fold this
    // replaced would do ~5e9 element copies here)
    val n = 100000
    val big = spark.range(n).select(lit(1).as("k"), col("id").as("t"),
      (col("id") % 7).cast("double").as("x"))
    val last = Windows.ewma(big, Seq(col("k")), col("t"), col("x"), 0.25, "s")
      .orderBy(desc("o")).select("s").as[Double].head()
    var st = 0.0
    (0 until n).foreach { i =>
      val x = (i % 7).toDouble
      st = if (i == 0) x else x * 0.25 + st * 0.75
    }
    assert(last == st)
  }

  test("cusum: clip-at-zero recursion by hand; alarm crosses h; nulls transparent") {
    val df = Seq((1, 1L, Some(5.0)), (1, 2L, Some(-9.0)), (1, 3L, Some(3.0)),
      (1, 4L, None), (1, 5L, Some(4.0)))
      .toDF("k", "t", "x")
    val got = Windows.cusum(df, Seq(col("k")), col("t"), col("x"),
        target = 0.0, h = 6.0)
      .select("o", "cusum", "alarm").as[(Long, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // s: max(0,5)=5; max(0,5-9)=0; max(0,0+3)=3; null -> stays 3; +4 -> 7 > h
    assert(got == Map(1L -> (5.0, false), 2L -> (0.0, false),
      3L -> (3.0, false), 4L -> (3.0, false), 5L -> (7.0, true)))
  }

  test("tokenBucket: burst drain, deny-keeps-level, refill clamp, equal-ts no-refill") {
    // cap 3000 mt, cost 1000, refill 1 mt/ms; one key, hand-traced:
    // t=0    full 3000 → allow, 2000
    // t=0    equal ts: NO refill     → allow, 1000
    // t=100  refill 100 → 1100       → allow, 100
    // t=200  refill 100 → 200 < 1000 → DENY, 200 (level untouched)
    // t=5000 refill 4800 → clamp 3000 → allow, 2000
    val df = Seq((1, 0L, 10L), (1, 0L, 11L), (1, 100L, 12L),
      (1, 200L, 13L), (1, 5000L, 14L)).toDF("k", "t", "eid")
    val got = Windows.tokenBucket(df, Seq(col("k")), col("t"), col("eid"),
        lit(1000L), capMt = 3000L, refillPerMs = 1L)
      .select("tb", "allowed", "tokens_mt")
      .as[(Long, Boolean, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(10L -> (true, 2000L), 11L -> (true, 1000L),
      12L -> (true, 100L), 13L -> (false, 200L), 14L -> (true, 2000L)))
  }

  test("tokenBucket: huge gap × large refill saturates to cap (no Long-overflow wrap)") {
    // gap ≈ 4.6e18 ms at refill 1e9 mt/ms would overflow Long ~2e9-fold
    // before the min-clamp (ADVICE r14) — the saturated fold must land
    // exactly at cap, not at a wrapped negative level that denies forever
    val cap = 1000000L
    val df = Seq((1, 0L, 20L), (1, Long.MaxValue / 2, 21L))
      .toDF("k", "t", "eid")
    val got = Windows.tokenBucket(df, Seq(col("k")), col("t"), col("eid"),
        lit(400000L), capMt = cap, refillPerMs = 1000000000L)
      .select("tb", "allowed", "tokens_mt")
      .as[(Long, Boolean, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(20L -> (true, 600000L), 21L -> (true, 600000L)),
      s"saturation broke the refill: $got")
    // degenerate parameters are rejected at construction, not at runtime
    intercept[IllegalArgumentException] {
      Windows.tokenBucket(df, Seq(col("k")), col("t"), col("eid"),
        lit(1L), capMt = Long.MaxValue / 2, refillPerMs = 1L)
    }
  }

  test("underwater: strict-below-peak runs; monotone series emit nothing") {
    // k=1: 10, 8, 9, 10, 10, 7, 7, 11 — peaks 10,10,10,10,10,10,10,11
    //   under: rows 2,3 (run of 2), rows 6,7 (run of 2); row 4 (=peak) not
    // k=2: monotone non-decreasing — never under, absent from the report
    val df = Seq(
      (1, 1L, 10.0), (1, 2L, 8.0), (1, 3L, 9.0), (1, 4L, 10.0),
      (1, 5L, 10.0), (1, 6L, 7.0), (1, 7L, 7.0), (1, 8L, 11.0),
      (2, 1L, 1.0), (2, 2L, 1.0), (2, 3L, 2.0)).toDF("k", "t", "x")
    val got = Windows.underwater(df, Seq(col("k")), Seq(col("t")), col("x"))
      .select("k", "n_runs", "longest_run", "n_under")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == Set((1, 2L, 2L, 4L)))
  }

  test("calendarGaps: weekend-adjacent islands merge; top-N keeps longest-first") {
    import graft.quality.DataQuality
    // calendar: 5 trading days; symbol A misses d2 and d4+d5 (one 1-day
    // and one 2-day island — a weekend between d4 and d5 must NOT split
    // the island because islands run on calendar RANK, so we simulate by
    // date-gapped calendar entries)
    val cal = Seq("2020-01-06", "2020-01-07", "2020-01-08", "2020-01-10",
      "2020-01-13").toDF("d").select(to_date(col("d")).as("trade_date"))
    val bars = Seq(("A", "2020-01-06"), ("A", "2020-01-08"))
      .toDF("symbol", "d").select(col("symbol"), to_date(col("d")).as("date"))
    // span = [01-06, 01-08]: only 01-07 is missing (01-10/13 outside span)
    val g1 = DataQuality.calendarGaps(bars, cal)
      .select("symbol", "gap_start", "gap_end", "n_days")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3))).toSet
    assert(g1 == Set(("A", "2020-01-07", "2020-01-07", 1L)))
    // widen the span: bar on the last calendar day → 01-07 island AND the
    // 01-10..01-13 island (2 calendar entries, spanning a real-week gap)
    val bars2 = bars.union(Seq(("A", "2020-01-14")).toDF("s", "d")
      .select(col("s"), to_date(col("d")).as("date")))
    // 01-14 is not IN the calendar — extend the calendar instead
    val cal2 = cal.union(Seq("2020-01-14").toDF("d")
      .select(to_date(col("d")).as("trade_date")))
    val g2 = DataQuality.calendarGaps(bars2, cal2, topPerSymbol = 1)
      .select("symbol", "gap_start", "gap_end", "n_days", "sev_rank")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDate(2).toString, r.getLong(3), r.getLong(4))).toSet
    // longest island (01-10..01-13, 2 trading days) outranks the 1-day one
    assert(g2 == Set(("A", "2020-01-10", "2020-01-13", 2L, 1L)))
  }
}
