package graft.functions

import org.apache.spark.sql.catalyst.expressions.{IsNull, If, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: graft_cosine(x, x) ≡ 1.0 (modulo null/zero-vector).
  *
  * Demonstrates the engine's Rule[LogicalPlan] injection path (SURVEY §7
  * "custom Catalyst work"): a self-similarity call — which shows up when
  * generated pipelines join a table to itself — collapses to a null-safe
  * literal instead of an O(d) loop per row. Registered alongside the
  * function via GraftExtensions (injectOptimizerRule).
  *
  * Conservative by design: only fires on semantically-equal children
  * (canonicalized), and preserves null propagation. A zero vector would
  * return NaN, not 1.0 — but a zero embedding is an upstream contract
  * violation either way; the rewrite documents this tradeoff.
  */
object CosineSelfSimilarityRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.canonicalized == b.canonicalized &&
          a.deterministic =>
        If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
    }
}
