package graft

import graft.quality.{Chunker, Packer}

/** Greedy sequence packing — capacity, order, bucket isolation, and the
  * reference greedy model replayed in plain Scala. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(items: Seq[(Long, Long, Long)], cap: Long, buckets: Int) =
    Packer.packGreedy(items.toDF("doc_id", "chunk_id", "n_tokens"),
        "doc_id", "chunk_id", "n_tokens", cap, buckets)
      .select("doc_id", "chunk_id", "n_tokens", "bucket", "bin", "bin_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

  test("greedy semantics: overflow closes the bin, oversized chunk isolated") {
    // single bucket: sizes 40,50,20 | 90 | 120 | 5 against capacity 100
    val rows = pack(Seq((0L, 0L, 40L), (0L, 1L, 50L), (0L, 2L, 20L),
      (0L, 3L, 90L), (0L, 4L, 120L), (0L, 5L, 5L)), cap = 100, buckets = 1)
    // 40+50=90 fits bin 0; 20 overflows → bin 1; 90 overflows (110) →
    // bin 2; 120 oversized → bin 3 alone; 5 overflows (125) → bin 4
    assert(rows.map(_._5).toSeq === Seq(0L, 0L, 1L, 2L, 3L, 4L))
  }

  test("matches a scalar greedy reference model on random-ish input") {
    val items = (0L until 40L).map(i => (i % 4, i / 4, (i * 37 % 90) + 10))
    val got = pack(items, cap = 128, buckets = 2)
    // scalar model: same bucketing, same order, same greedy rule
    val want = items.sortBy(t => (t._1, t._2)).groupBy(_._1 % 2).flatMap {
      case (bucket, its) =>
        var bin = -1L; var fill = 129L
        its.sortBy(t => (t._1, t._2)).map { case (d, c, n) =>
          if (fill + n > 128) { bin += 1; fill = n } else fill += n
          (d, c, n, bucket, bin, bucket * 1000000L + bin)
        }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(got.toSeq === want)
  }

  test("capacity is respected when every chunk fits capacity") {
    val items = (0L until 60L).map(i => (i % 8, i / 8, (i * 13 % 30) + 1))
    val df = Packer.packGreedy(items.toDF("doc_id", "chunk_id", "n_tokens"),
      "doc_id", "chunk_id", "n_tokens", capacity = 40, numBuckets = 4)
    val over = df.groupBy("bin_id").agg(
        org.apache.spark.sql.functions.sum("n_tokens").as("s"))
      .filter("s > 40").count()
    assert(over === 0L)
  }

  test("end-to-end with Chunker on the fixture documents") {
    val docs = graft.sources.TestData(spark, sf0001).documents
    val chunks = Chunker.chunkByTokens(docs, "doc_id", "text", 32, 8)
    val packed = Packer.packGreedy(chunks, "doc_id", "chunk_id", "n_tokens",
      capacity = 100, numBuckets = 8)
    assert(packed.count() === chunks.count()) // every chunk assigned once
    val over = packed.groupBy("bin_id").agg(
        org.apache.spark.sql.functions.sum("n_tokens").as("s"))
      .filter("s > 100").count()
    assert(over === 0L) // chunk max 32 < 100 → no bin overflows
  }
}
