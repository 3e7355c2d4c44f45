package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge for graft's native Catalyst expressions.
  *
  * Spark 4 removed the public `Column(expr)` constructor; the supported
  * in-JVM path is `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` — so this one-file bridge lives inside the `sql` package
  * (the established extension-library pattern) and re-exports exactly the
  * two conversions. Keeping it isolated here means the rest of graft never
  * touches Spark-private API directly.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
