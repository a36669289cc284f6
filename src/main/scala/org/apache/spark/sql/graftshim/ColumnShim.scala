package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `Column` and Catalyst `Expression` for Spark 4.x, where
  * `org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]`. Living
  * in an `org.apache.spark.sql` subpackage grants access; user code goes
  * through this one indirection so custom `Expression`s (e.g. the StaleNaN
  * bit test in `graft.functions.Bits`) can be exposed as `Column`s.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
