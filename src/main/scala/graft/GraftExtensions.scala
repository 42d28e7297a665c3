package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** Session extensions exposing graft's custom catalyst expressions to SQL
  * users: `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * `GraftExtensions.register(spark)` on a live session.
  *
  * `graft_dot(a, b)`: codegen'd double dot product over two
  * array<float|double> columns (see [[graft.functions.DotProduct]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {
  private val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_dot(a, b) takes exactly two array columns")
      DotProduct(exprs.head, exprs(1))
    })

  /** Register on an already-built session (extensions configured at build
    * time only apply to new SparkContexts). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
}
