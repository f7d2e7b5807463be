package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` constructors an extension library
  * cannot avoid: `Dataset.ofRows` (a DataFrame from graft's
  * raster-fusion [[LogicalPlan]]) and `ExpressionUtils.column` /
  * `.expression` (a [[Column]] from a programmatically-built
  * [[Expression]] and its inverse — graft's broadcast-centroid argmax
  * carries a `Broadcast` handle no SQL string can spell, and applying
  * a graft expression to a COMPUTED column needs the column's
  * expression back). These one-liners in the sql package namespace are
  * the established extension-library pattern. Nothing else may be
  * added here. */
object GraftPlanBridge {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark, plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
