package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path expectations — declarative row constraints enforced at
  * ingest (the lakehouse "expectations" pattern): every row is evaluated
  * against named boolean checks; passing rows land in the table, failing
  * rows are QUARANTINED with the list of checks they failed — never
  * silently dropped (at 100 TB the quarantine IS the data-quality
  * dashboard's source).
  *
  * Mechanics: one `localCheckpoint`ed pass computes the violation label
  * (checks evaluate once, not once per output), then two pruned writes.
  * A NULL check result counts as a FAILURE (an expectation that cannot
  * be evaluated is not satisfied — ANSI-off coerce-to-null would
  * otherwise let nulls sail through every gate). Check order in the
  * reason string is the caller's declaration order — deterministic.
  */
object Expectations {

  case class Result(valid: Long, quarantined: Long)

  /** Label each row with the comma-joined names of the checks it FAILS
    * (empty string = clean). Exposed for gating/audit queries. */
  def violations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame =
    df.withColumn("__violations",
      concat_ws(",", checks.map { case (name, c) =>
        when(coalesce(c, lit(false)), lit(null)).otherwise(lit(name))
      }: _*))

  /** Enforce `checks` on `df`: valid rows → `path`, failing rows (plus
    * their `__violations` label) → `quarantinePath`. Returns counts. */
  def writeWithExpectations(df: DataFrame, path: String,
                            quarantinePath: String,
                            checks: Seq[(String, Column)]): Result = {
    val labeled = violations(df, checks).localCheckpoint()
    val valid = labeled.filter(col("__violations") === "").drop("__violations")
    val bad = labeled.filter(col("__violations") =!= "")
    valid.write.mode("overwrite").parquet(path)
    bad.write.mode("overwrite").parquet(quarantinePath)
    val spark = df.sparkSession
    Result(spark.read.parquet(path).count(),
      spark.read.parquet(quarantinePath).count())
  }
}
