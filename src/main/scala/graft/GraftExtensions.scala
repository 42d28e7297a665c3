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
  * `graft_norm_sq(a)`: codegen'd squared L2 norm.
  * `graft_cms_merge(sk)`: union-merge aggregate of serialized count-min
  * sketches. `graft_quantile_sketch(v, eps)` / `graft_quantile_merge(sk)`
  * / `graft_quantile_query(sk, p)` / `graft_quantile_bound(sk)`: the
  * mergeable GK quantile family (eps and percentages must be literals).
  * `graft_vector_moments(v)`: flat-buffer second-moment cells of a vector
  * column (the whitening fit's aggregation).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.allFunctions.foreach(e.injectFunction)
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

  /** Literal-percentage extraction shared by the quantile SQL surface:
    * accepts a single literal double or a foldable array of doubles. */
  private def literalPercentages(e: Expression): Seq[Double] = {
    require(e.foldable,
      "quantile percentages must be literal (a double or array<double>)")
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case d: Double => Seq(d)
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(
        s"unsupported percentage literal: $other")
    }
  }

  private val cmsMergeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cms_merge"),
    new ExpressionInfo(classOf[graft.functions.CmsMerge].getName, "graft_cms_merge"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_cms_merge(sk) takes one binary sketch column")
      graft.functions.CmsMerge(exprs.head).toAggregateExpression()
    })

  private val quantileSketchFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quantile_sketch"),
    new ExpressionInfo(classOf[graft.functions.QuantileSketchAgg].getName, "graft_quantile_sketch"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "graft_quantile_sketch(v, eps) takes a value column and a literal relative error")
      val eps = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_quantile_sketch eps must be a literal double, got $other")
      }
      graft.functions.QuantileSketchAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(
          exprs.head, org.apache.spark.sql.types.DoubleType), eps)
        .toAggregateExpression()
    })

  private val quantileMergeFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quantile_merge"),
    new ExpressionInfo(classOf[graft.functions.QuantileSketchMergeAgg].getName, "graft_quantile_merge"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_quantile_merge(sk) takes one binary sketch column")
      graft.functions.QuantileSketchMergeAgg(exprs.head).toAggregateExpression()
    })

  private val quantileQueryFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quantile_query"),
    new ExpressionInfo(classOf[graft.functions.QuantileSketchQuery].getName, "graft_quantile_query"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        "graft_quantile_query(sk, p) takes a sketch column and literal percentage(s)")
      graft.functions.QuantileSketchQuery(exprs.head,
        literalPercentages(exprs(1)))
    })

  private val quantileBoundFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_quantile_bound"),
    new ExpressionInfo(classOf[graft.functions.QuantileSketchBound].getName, "graft_quantile_bound"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_quantile_bound(sk) takes one sketch column")
      graft.functions.QuantileSketchBound(exprs.head)
    })

  private val vectorMomentsFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_vector_moments"),
    new ExpressionInfo(classOf[graft.functions.VectorMoments].getName, "graft_vector_moments"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 1, "graft_vector_moments(v) takes one array column")
      graft.functions.VectorMoments(exprs.head).toAggregateExpression()
    })

  private[graft] val allFunctions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(dotFunction, topkFunction, normSqFunction, cmsMergeFunction,
      quantileSketchFunction, quantileMergeFunction, quantileQueryFunction,
      quantileBoundFunction, vectorMomentsFunction)

  /** Register on an already-built session (extensions configured at build
    * time only apply to new SparkContexts). The optimizer rule rides on
    * `spark.experimental.extraOptimizations`, the supported live-session
    * injection point. */
  def register(spark: SparkSession): Unit = {
    allFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.SelfDotToNormSq))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.SelfDotToNormSq
  }
}
