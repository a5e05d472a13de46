package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the classic converters
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * a library defining native Catalyst expressions needs this one-file
  * foothold inside the `org.apache.spark.sql` namespace — the same
  * pattern Spark-extension libraries use. Nothing else in the engine
  * lives outside the `graft` package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
