package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`.
  * Placed in the `org.apache.spark.sql` package solely to satisfy the access
  * modifier — the standard pattern for libraries that define custom Catalyst
  * expressions and need a Column face for them. Nothing else lives here. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
