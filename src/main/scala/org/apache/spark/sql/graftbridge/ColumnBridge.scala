package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> catalyst Expression
  * conversions (Spark 4 wraps Columns in ColumnNodes; the classic
  * converters live behind package-private access). Lives under
  * `org.apache.spark.sql` for visibility — the standard pattern for
  * libraries that register custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
