package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge for Spark 4.x, where the classic
  * `Column(expr)` constructor and `.expr` accessor are private[sql] behind
  * ColumnNode. Lives under org.apache.spark.sql to satisfy the package-
  * private access; the rest of graft uses only this facade.
  */
object Bridge {
  def toExpr(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
