package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  * Spark 4's `Column` wraps a ColumnNode and no longer exposes `.expr`;
  * the classic-mode converter lives behind `private[sql]`, so this
  * one-file shim (in the sql package, the standard extension-library
  * practice) re-exports the two conversions our custom expressions
  * need.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
