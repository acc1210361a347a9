package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 split `Column` into the
  * connect-agnostic API (a `ColumnNode`) and made the classic
  * converters `private[sql]`; extension libraries bridge from an
  * `org.apache.spark.sql` subpackage — the established pattern for
  * custom-Expression integrations.
  */
object Shims {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
