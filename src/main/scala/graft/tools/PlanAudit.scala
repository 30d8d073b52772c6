package graft.tools

import org.apache.spark.sql.DataFrame
import graft.{Sessions, SparkEntry}

/** Plan / timing audit: prints the formatted physical plan and wall time of
  * one or more SparkEntry queries, so pushdown (`PushedFilters`,
  * `ReadSchema`) and WholeStageCodegen spans can be inspected per query.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir> <query...|all> [--plan]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val showPlan = args.contains("--plan")
    val names = args.drop(1).filterNot(_ == "--plan") match {
      case Array() | Array("all") => SparkEntry.queries.keys.toSeq.sorted
      case qs => qs.toSeq
    }
    val spark = Sessions.local(appName = "graft-plan-audit")
    names.foreach { name =>
      val df: DataFrame = SparkEntry.queries(name)(spark, sfDir)
      if (showPlan) {
        println(s"=== $name: physical plan ===")
        df.explain("formatted")
      }
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"=== $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

/** Stage-level breakdown of the MinHash LSH pipeline (perf investigation). */
object MinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-minhash-probe")
    val docs = graft.sources.TestData(spark, sfDir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"--- $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import org.apache.spark.sql.functions._
    val sh = graft.dedup.Dedup.wordShingles(docs, "doc_id", "text", 3).persist()
    time("shingles count")(sh.count())
    val sigs = graft.dedup.Dedup.minHashSignatures(sh, 16)
    time("signatures")(sigs.count())
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * 4 until (b + 1) * 4).map(i => col(s"sig_$i")): _*).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = buckets.groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, 100))
      .select(explode(flatten(transform(array_sort(col("ds")), (x, i) =>
        transform(slice(array_sort(col("ds")), i + 2, size(col("ds"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct().persist()
    time("cands")(cands.count())
    time("verify")(graft.dedup.Dedup.verifyJaccard(cands, sh, 0.5).count())
    time("full minHashLsh")(
      graft.dedup.Dedup.minHashLsh(docs, "doc_id", "text", 3, 4, 4, 0.5, 100).count())
    spark.stop()
  }
}

/** Stage-level breakdown of the Md5Hash minhash path. */
object Md5MinHashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-md5-probe")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.TestData(spark, sfDir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"--- $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fam = graft.dedup.Dedup.Md5Hash
    val sh = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
    val shs = sh.filter(size(col("ws")) >= 3).select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))).as("shs"))
    val rows = shs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    time("explode count")(println(rows.count()))
    val sigs = graft.dedup.Dedup.minHashSignatures(rows, 16, fam)
    time("signatures")(println(sigs.count()))
    val full = graft.dedup.Dedup.minHashLsh(docs, "doc_id", "text", 3, 4, 4, 0.5, 100, fam)
    time("full lsh")(println(full.count()))
    spark.stop()
  }
}

/** Finer breakdown: array generation vs explode vs digest vs agg. */
object Md5MinHashProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-md5-probe2")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.TestData(spark, sfDir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"--- $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val fam = graft.dedup.Dedup.Md5Hash
    val sh = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
    val shs = sh.filter(size(col("ws")) >= 3).select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))).as("shs"))
    time("arrays only: sum of sizes")(println(shs.select(sum(size(col("shs")))).head()))
    val rows = shs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    time("explode, count only")(println(rows.count()))
    val withP = rows.withColumn("_p", fam.prep(col("shingle")))
    time("digest per row")(println(withP.select(max(col("_p.h1"))).head()))
    val sigs = graft.dedup.Dedup.minHashSignatures(rows, 16, fam)
    time("signatures agg")(println(sigs.count()))
    time("signatures again")(println(sigs.count()))
    spark.stop()
  }
}

/** Print optimized plans to diagnose lambda re-inlining. */
object InlineCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-inline-check")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.TestData(spark, sfDir).documents
    val sh = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
    val shs = sh.filter(size(col("ws")) >= 3).select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))).as("shs"))
    val rows = shs.select(col("doc_id"), explode(col("shs")).as("shingle"))
    val p = rows.queryExecution.optimizedPlan.toString
    println("SPLIT-COUNT " + "split\\(".r.findAllIn(p).length)
    println("WS-PROJECT " + (if (p.contains("AS ws")) "kept" else "collapsed"))
    println(p.take(2500))
    spark.stop()
  }
}

/** Verify explode_outer dodges InferFiltersFromGenerate's O(w^2) filter. */
object InlineCheck2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-inline-check2")
    import org.apache.spark.sql.functions._
    val docs = graft.sources.TestData(spark, sfDir).documents
    val sh = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
    val shs = sh.filter(size(col("ws")) >= 3).select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))).as("shs"))
    val rows = shs.select(col("doc_id"), explode_outer(col("shs")).as("shingle"))
    val p = rows.queryExecution.optimizedPlan.toString
    println("SPLIT-COUNT " + "split\\(".r.findAllIn(p).length)
    val t0 = System.nanoTime()
    println("rows " + rows.count())
    println(f"TIME ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}

/** Library-path stage breakdown for Md5Hash minhash. */
object Md5MinHashProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-md5-probe3")
    import org.apache.spark.sql.functions._
    import graft.dedup.Dedup
    val docs = graft.sources.TestData(spark, sfDir).documents
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"--- $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(docs.count())
    val fam = Dedup.Md5Hash
    val sh0 = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
    val shs = sh0.filter(size(col("ws")) >= 3).select(col("doc_id"),
      transform(sequence(lit(0), size(col("ws")) - 3),
        i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2), element_at(col("ws"), i + 3))).as("shs"))
    val rows = shs.select(col("doc_id"), explode_outer(col("shs")).as("shingle"))
    time("rows (outer)")(println(rows.count()))
    val sigs = Dedup.minHashSignatures(rows, 16, fam)
    time("sigs")(println(sigs.count()))
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        fam.combine((b * 4 until (b + 1) * 4).map(i => col(s"sig_$i"))).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    time("buckets")(println(buckets.count()))
    val cands = buckets.groupBy("band", "bucket")
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, 100))
    time("cands")(println(cands.count()))
    val full = Dedup.minHashLsh(docs, "doc_id", "text", 3, 4, 4, 0.5, 100, fam)
    time("full (warm)")(println(full.count()))
    spark.stop()
  }
}
