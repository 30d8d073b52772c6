package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark 4's `private[sql]` LogicalPlan ↔ DataFrame converters —
  * the counterpart of [[ColumnBridge]] for whole-plan extensions: a custom
  * logical operator ([[graft.plans.AsOfJoinPlan]]) needs its children's
  * ANALYZED plans as input and a way to wrap the node back into a frame. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
