package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{DotProduct, NormSq}

/** Optimizer rule: strength-reduce self-dot-products.
  *
  * Every cosine/norm computation in the engine spells `graft_dot(x, x)` —
  * the natural user-facing form. This rule rewrites it to the single-pass
  * [[NormSq]] expression whenever both sides are semantically the same
  * deterministic expression: half the array reads in the inner loop, and
  * the child expression appears once in the plan instead of twice (so
  * downstream rules and the interpreted fallback never evaluate it twice).
  *
  * Semantics preserved exactly: NormSq accumulates double left-to-right,
  * bit-identical to DotProduct(x, x). Non-deterministic children are left
  * alone (rewriting would collapse two independent samples into one).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (config
  * `spark.sql.extensions=graft.GraftExtensions`) or
  * `spark.experimental.extraOptimizations` on a live session — the (c)
  * rung of the custom-operator ladder: a `Rule[LogicalPlan]` the built-in
  * optimizer has no reason to know about.
  */
object SelfDotToNormSq extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
        NormSq(a)
    }
}
