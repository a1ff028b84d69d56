/* Bridge into Spark's private[sql] Column<->Expression conversions —
 * the standard technique third-party Catalyst extensions (delta,
 * frameless, sedona, …) use to expose custom Expressions as Columns
 * on Spark 4's split Column API. Nothing else lives in this package.
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
