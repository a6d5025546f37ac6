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
}
