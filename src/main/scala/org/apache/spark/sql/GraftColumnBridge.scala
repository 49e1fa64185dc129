package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions of
  * Spark 4's classic API, so graft's native Catalyst expressions
  * (graft.functions) can surface as Columns without a FunctionRegistry
  * round-trip. This is the standard extension-library technique for
  * pre-`SparkSessionExtensions` expression exposure. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
