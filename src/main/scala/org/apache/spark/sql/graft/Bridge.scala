package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed `Column.expr` / `new Column(Expression)` from the public
  * API; the supported conversion lives in `org.apache.spark.sql.classic.
  * ExpressionUtils`, which is `private[sql]`. This bridge re-exports the two
  * conversions to graft. It is the only place graft touches a non-public
  * Spark API, and it goes through the blessed classic conversion path.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
