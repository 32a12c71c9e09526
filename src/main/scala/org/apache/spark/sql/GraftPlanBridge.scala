package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows, so graft code can wrap a
  * custom logical leaf (e.g. [[graft.plans.IcebergScanPlan]]) into a
  * DataFrame that Catalyst rules later replace. Same shim pattern as
  * [[GraftColumnBridge]]. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
