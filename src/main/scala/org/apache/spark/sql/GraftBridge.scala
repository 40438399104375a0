package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters.
  *
  * Spark 4's Column is a Connect-compatible façade over ColumnNode;
  * the classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * are `private[sql]`. Extension libraries that ship custom Catalyst
  * expressions (graft.functions.VectorExpressions) need exactly these
  * two calls, so this one-file shim lives in the sql package — the same
  * technique Spark-native extension projects use to expose expression
  * Columns without a FunctionRegistry round-trip.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
