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

  /** The `private[sql]` Dataset ⇄ LogicalPlan converters, needed by
    * whole-operator extensions (custom logical nodes planned by an
    * injected strategy). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Eagerly converts a Column to a Catalyst expression through the
    * session's node converter. `expression(c)` above wraps lazily
    * (ColumnNodeExpression) — fine when re-embedded in a Column, but a
    * custom LogicalPlan needs the real expression tree up front. */
  def resolvedExpression(c: Column, spark: org.apache.spark.sql.SparkSession): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)
}
