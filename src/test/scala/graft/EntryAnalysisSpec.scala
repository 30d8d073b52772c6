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
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(200)}") }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("oracle keys are a subset of query names, names are distinct") {
    val qNames = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qNames
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
  }
}
