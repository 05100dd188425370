package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column to a ColumnNode representation; the
  * Expression<->Column bridge (`org.apache.spark.sql.classic.
  * ExpressionUtils`) is `private[sql]`. This shim, living under the
  * `org.apache.spark.sql` package tree, re-exports the two conversions
  * the engine's custom Catalyst expressions need. No Spark internals are
  * modified — this is the standard extension-library technique.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `Dataset.ofRows` (DataFrame from a hand-built LogicalPlan) is
    * `private[sql]` in Spark 4's classic module; custom logical
    * operators (graft.plans.AsofJoinPlan) need it to surface as
    * DataFrames. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
