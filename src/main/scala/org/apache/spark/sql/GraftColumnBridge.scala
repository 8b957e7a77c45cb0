package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ catalyst-Expression converters
  * (Spark 4 moved Column to a backend-agnostic ColumnNode representation;
  * `classic.ExpressionUtils` holds the classic-backend converters). Lives in
  * the org.apache.spark.sql package namespace solely to satisfy the access
  * modifier — the standard technique for Catalyst-extending libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
