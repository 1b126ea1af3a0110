package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 removed the public `Column.expr`
  * (Connect refactor); the classic converters are private[sql], so this
  * one-file shim lives in the org.apache.spark.sql namespace — the standard
  * pattern for Spark extension libraries. */
object ColumnShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
