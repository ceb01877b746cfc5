package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters. Spark 4
  * moved `Column` to the api module (wrapping `ColumnNode`, no public
  * `.expr`); libraries contributing custom Catalyst expressions use a
  * same-namespace bridge like this — the standard extension-point
  * workaround, no Spark internals duplicated.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
