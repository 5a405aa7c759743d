package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Classic-mode DataFrame <-> LogicalPlan bridge.
  *
  * Spark 4 keeps `Dataset.ofRows` and `queryExecution` behind
  * `private[sql]` on the classic implementation, so a library that defines
  * its own logical plan nodes needs this one in-package accessor to wrap a
  * custom [[LogicalPlan]] back into a user-facing [[DataFrame]] — the same
  * pattern as [[ColumnBridge]].
  */
object PlanBridge {
  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
