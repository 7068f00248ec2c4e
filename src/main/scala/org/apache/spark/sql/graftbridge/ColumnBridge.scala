package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to sql-api (wrapping a ColumnNode); the
  * converters live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. This one-file shim inside the sql package
  * is the standard extension technique for libraries that provide
  * native Catalyst expressions (the alternative — Column.expr — was
  * removed in 4.0).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
