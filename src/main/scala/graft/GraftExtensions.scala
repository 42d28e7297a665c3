package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, TopKDesc}

/** Session extensions exposing graft's custom catalyst expressions to SQL
  * users: `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * `GraftExtensions.register(spark)` on a live session.
  *
  * `graft_dot(a, b)`: codegen'd double dot product over two
  * array<float|double> columns (see [[graft.functions.DotProduct]]).
  * `graft_topk(v, k)`: bounded-heap top-k aggregate, descending
  * (see [[graft.functions.TopKDesc]]); k must be a literal integer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dotFunction)
    e.injectFunction(GraftExtensions.topkFunction)
    e.injectFunction(GraftExtensions.normSqFunction)
    e.injectOptimizerRule(_ => graft.plans.SelfDotToNormSq)
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

  private val topkFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKDesc].getName, "graft_topk"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2, "graft_topk(v, k) takes a value column and a literal k")
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be a literal integer, got $other")
      }
      TopKDesc(org.apache.spark.sql.catalyst.expressions.Cast(
        exprs.head, org.apache.spark.sql.types.DoubleType), k)
        .toAggregateExpression()
    })

  private val normSqFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_norm_sq"),
    new ExpressionInfo(classOf[graft.functions.NormSq].getName, "graft_norm_sq"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_norm_sq(a) takes exactly one array column")
      graft.functions.NormSq(exprs.head)
    })

  /** Register on an already-built session (extensions configured at build
    * time only apply to new SparkContexts). The optimizer rule rides on
    * `spark.experimental.extraOptimizations`, the supported live-session
    * injection point. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      dotFunction._1, dotFunction._2, dotFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      topkFunction._1, topkFunction._2, topkFunction._3)
    spark.sessionState.functionRegistry.registerFunction(
      normSqFunction._1, normSqFunction._2, normSqFunction._3)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SelfDotToNormSq))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SelfDotToNormSq
  }
}
