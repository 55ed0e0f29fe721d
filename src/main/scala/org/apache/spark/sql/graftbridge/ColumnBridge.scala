package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the classic `Column`
  * internals behind `private[sql]` (`columnNodeSupport.scala`); custom
  * Catalyst expressions still need to surface as `Column`s. The usual
  * extension-library pattern: one tiny accessor inside the
  * `org.apache.spark.sql` namespace, nothing else lives here.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
