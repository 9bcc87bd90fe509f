package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * supported bridge (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This shim, placed in an org.apache.spark.sql subpackage
  * (the conventional technique for Spark extension libraries), re-exports
  * just the two converters graft's custom Catalyst expressions need.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
