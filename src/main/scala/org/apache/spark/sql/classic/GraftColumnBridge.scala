package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters.
  *
  * Spark 4 wraps Columns around ColumnNodes; the only supported way to
  * build a Column from a custom Catalyst Expression in classic (JVM)
  * Spark is `ExpressionUtils`, which is package-private. This shim lives
  * in the same package purely to re-export those two functions for
  * graft.functions — the well-known extension pattern for libraries that
  * ship custom expressions without forking Spark.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
