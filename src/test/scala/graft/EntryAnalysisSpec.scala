package graft

/** Analysis smoke test over the ENTIRE gate surface: every entry in
  * [[SparkEntry.queries]] must at least produce a resolved logical plan
  * against the sf0.001 fixtures. This is cheap (no execution — seconds for
  * the whole map) and exists because round 5 shipped a query that threw
  * `UNRESOLVED_COLUMN` on first touch: specs-by-convention don't cover
  * late-added queries, this does, mechanically.
  *
  * Also pins the gate invariants the driver relies on: every query has a
  * distinct name, and every oracle key refers to a registered query.
  */
class EntryAnalysisSpec extends SparkSpec {

  test("every SparkEntry query analyzes against sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf0001).queryExecution.analyzed; None }
        catch { case e: Throwable => // getMessage is null for SOE/NPE — fall back to the class name
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(200)}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("no gate emits a decimal-family output column") {
    // Driver-hash hazard (r13 text_collocations, r10 graph_pagerank one
    // layer down): DECIMAL/HUGEINT output columns round-trip differently
    // through the driver's parquet reader vs its DuckDB oracle during hash
    // canonicalization, so a gate can be value-exact locally and still red
    // in CORRECTNESS. Decimals are fine INTERNALLY (exact cross-multiply);
    // they must never reach a dumped schema. tools/local_verify.py carries
    // the same guard on the dumped parquet side.
    import org.apache.spark.sql.types.DecimalType
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val schema = fn(spark, sf0001).queryExecution.analyzed.schema
          val dec = schema.fields.collect {
            case f if f.dataType.isInstanceOf[DecimalType] => f.name
          }
          if (dec.nonEmpty) Some(s"$name: ${dec.mkString(", ")}") else None
        } catch { case _: Throwable => None } // analysis failures: first test
    }
    assert(offenders.isEmpty,
      s"decimal-family output columns (driver hash hazard):\n${offenders.mkString("\n")}")
  }

  test("oracle keys are a subset of query names, names are distinct") {
    val qNames = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qNames
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }

  test("no duplicate gate keys in the SparkEntry source") {
    // A Map literal silently keeps the LAST duplicate key, so a re-used
    // gate name shadows an earlier query AND its oracle with no compile
    // or runtime signal (round-12 precedent: a second "stream_enrich"
    // made the new dim-default lane dead code). The Map can't see it —
    // the source can.
    // r16: the gate wiring is split across SparkEntry.scala (oracles +
    // composition) and the per-family traits under entry/ — the guard
    // scans their UNION, so a key duplicated ACROSS files is caught too
    val entryFiles = new java.io.File("src/main/scala/graft/entry")
      .listFiles().filter(_.getName.endsWith(".scala")).map(_.getPath).sorted
    val text = ("src/main/scala/graft/SparkEntry.scala" +: entryFiles.toSeq)
      .map { p =>
        val src = scala.io.Source.fromFile(p, "UTF-8")
        try src.mkString finally src.close()
      }.mkString("\n")
    val qKeyRe = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
    def dups(keys: Seq[String]) =
      keys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    val qDups = dups(qKeyRe.findAllMatchIn(text).map(_.group(1)).toSeq)
    assert(qDups.isEmpty, s"duplicate query keys: $qDups")
    // Any gate name bound more than twice (once as query, at most once as
    // oracle) means a duplicate somewhere — regardless of entry layout.
    val anyKeyRe = """"([a-z0-9_]+)" ->""".r
    val counts = anyKeyRe.findAllMatchIn(text).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val over = SparkEntry.queries.keySet.filter(k => counts.getOrElse(k, 0) > 2)
    assert(over.isEmpty, s"gate names bound more than query+oracle: $over")
  }

  test("every oracle references only fixture tables the driver registers") {
    // the driver creates one DuckDB view per fixture parquet; a typo'd
    // table name would only surface as a driver-side SQL error next round
    // — catch it here. FROM/JOIN targets must be fixture tables or CTE
    // names defined in the same statement.
    val fixtures = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // `(?<!DISTINCT\s)` keeps the null-safe comparator `IS NOT DISTINCT
    // FROM alias.col` from reading as a table reference (j11_nullsafe).
    val fromRe =
      "(?is)\\b(?:(?<!DISTINCT\\s)FROM|JOIN)\\s+([A-Za-z_][A-Za-z0-9_]*)".r
    // CTE name forms: `name AS (`, `WITH [RECURSIVE] name AS (`,
    // `name AS MATERIALIZED (`, and column-listed `name(c1, c2) AS (`
    val cteRe = ("(?im)(?:^|,|\\(|\\bWITH\\b(?:\\s+RECURSIVE)?)\\s*" +
      "([A-Za-z_][A-Za-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(").r
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val ctes = cteRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val refs = fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = refs -- ctes -- fixtures -
        "unnest" - "range" - "read_parquet" // table functions
      if (unknown.isEmpty) None else Some(s"$name: $unknown")
    }
    assert(bad.isEmpty, s"\nunknown oracle table refs:\n${bad.mkString("\n")}")
  }
}
