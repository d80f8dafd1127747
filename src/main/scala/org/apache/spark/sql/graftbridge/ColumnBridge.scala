package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column↔Expression converters —
  * the minimal foothold a library needs to expose custom Catalyst
  * expressions as `Column`s on Spark 4 (where `new Column(expr)` is
  * gone). Lives under `org.apache.spark.sql` solely for access. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
