package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows`, which is `private[sql]`: building a
  * DataFrame from a custom [[LogicalPlan]] node (graft's raster-fusion
  * plan) has no public-API equivalent, and this one-liner in the sql
  * package namespace is the established extension-library pattern for
  * it. Nothing else may be added here. */
object GraftPlanBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)
}
