package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from Catalyst [[Expression]]s to the public [[Column]] API.
  *
  * Spark 4 moved Column onto ColumnNode (Connect refactor); the classic
  * Expression→Column lift lives behind `private[sql]`. This object sits
  * in an `org.apache.spark.sql` subpackage solely to re-export that
  * lift for graft's custom expressions (uuid_str, envelope_json, …).
  * No Spark internals are modified.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Analyzed logical plan of a DataFrame, and the reverse lift — the
    * two ends a custom logical operator (graft.plans.AsOfJoinPlan)
    * needs: both live behind `private[sql]` on the classic Dataset. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
