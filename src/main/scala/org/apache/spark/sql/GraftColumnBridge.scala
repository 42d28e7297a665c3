package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's classic Column <-> catalyst Expression conversion
  * (`ExpressionUtils` is private[sql]; Spark 4 removed the public
  * `Column.expr` / `new Column(expr)` surface when Column moved to
  * sql-api). Standard technique for libraries shipping custom catalyst
  * expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
