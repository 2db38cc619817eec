package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` plan <-> DataFrame conversions, for
  * constructing DataFrames over custom logical operators (the standard
  * pattern for libraries that add plan nodes; see ColumnBridge for the
  * expression-level analog). */
object PlanBridge {
  /** The analyzed-logical-plan of a DataFrame, for wrapping in a custom
    * logical node. */
  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** DataFrame over an arbitrary logical plan (Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
