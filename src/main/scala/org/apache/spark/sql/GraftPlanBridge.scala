package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the two `private[sql]` constructors an extension library
  * cannot avoid: `Dataset.ofRows` (a DataFrame from graft's
  * raster-fusion [[LogicalPlan]]) and `ExpressionUtils.column` (a
  * [[Column]] from a programmatically-built [[Expression]] — graft's
  * broadcast-centroid argmax carries a `Broadcast` handle no SQL string
  * can spell). Both one-liners in the sql package namespace are the
  * established extension-library pattern. Nothing else may be added
  * here. */
object GraftPlanBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
