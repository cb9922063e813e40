package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for Spark 4.x, where the Column API is
  * decoupled from Catalyst (Spark Connect refactor) and the converters in
  * `org.apache.spark.sql.classic.ExpressionUtils` are `private[sql]`.
  * Lives under the `org.apache.spark.sql` package solely to re-export them;
  * contains no logic of its own.
  */
object shims {
  def toCol(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}
