package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: threshold filters over the exact cosine kernel gain a
  * cheap double-precision prefilter.
  *
  *   Filter(cosine_sim_exact(a,b) >= t)
  *     ==>  Filter(fast_cosine(a,b) >= t - margin  AND  cosine_sim_exact(a,b) >= t)
  *
  * The fast form is a plain double fold (DotFast), ~10-50x cheaper per pair
  * than the exact decimal sum; the conjunction short-circuits, so the exact
  * kernel only runs on pairs already near the threshold. This automates the
  * two-phase pattern q41 writes by hand — at 100 TB candidate-pair scale the
  * exact kernel is the hot path and the prefilter drops ~all of it.
  *
  * Semantics are EXACTLY preserved:
  * - |fast - exact| ≤ kernel rounding (≤ 0.5e-9 from the 9-decimal round)
  *   plus float fold error (~1e-14 relative) — both ≪ margin 1e-6, so the
  *   prefilter never rejects a pair the exact filter would keep;
  * - zero-norm vectors make the fast form NULL (under EvalMode.LEGACY a
  *   zero DIVISOR yields NULL, not NaN), so the prefilter predicate is
  *   NULL there — and the conjunction stays correct because the exact
  *   kernel defines cosine = 0.0 for zero norms, making the original
  *   predicate `0.0 >= t` = false for every t the rule fires on (t >
  *   margin > 0): And(NULL, false) = false, the same rejection the
  *   un-rewritten filter produces. Equally under Not(...): Not(And(NULL,
  *   false)) = Not(false) = true = Not(original). Pinned by the zero-norm
  *   cases in CosinePrefilterSpec;
  * - the rule only fires for t > margin and skips any Filter that already
  *   contains a DotFast (idempotence under the optimizer's fixed-point batch,
  *   and respect for hand-written prefilters like q41's).
  *
  * Registered via `spark.experimental.extraOptimizations`
  * ([[GraftFunctions.register]]) or `SparkSessionExtensions
  * .injectOptimizerRule` ([[GraftExtensions]]).
  */
object CosinePrefilter extends Rule[LogicalPlan] {
  val Margin = 1e-6

  /** LEGACY eval mode pinned: under ANSI (the Spark 4 default) Divide
    * raises on a zero divisor, but the zero-norm case must flow through as
    * NULL (legacy zero-divisor semantics) so the surrounding conjunction
    * can resolve it — see the zero-norm bullet in the class doc.
    */
  private def fastCosine(a: Expression, b: Expression): Expression =
    Divide(DotFast(a, b),
      Multiply(Sqrt(DotFast(a, a)), Sqrt(DotFast(b, b)), EvalMode.LEGACY),
      EvalMode.LEGACY)

  private def prefixed(cond: Expression, c: CosineSimExact, t: Double): Expression =
    And(GreaterThanOrEqual(fastCosine(c.left, c.right), Literal(t - Margin)), cond)

  // transformUp: a top-down transform would descend into the rewritten
  // And's children and match the embedded original again, unboundedly
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case ge @ GreaterThanOrEqual(c: CosineSimExact, Literal(t: Double, DoubleType))
        if t > Margin => prefixed(ge, c, t)
    case gt @ GreaterThan(c: CosineSimExact, Literal(t: Double, DoubleType))
        if t > Margin => prefixed(gt, c, t)
    case le @ LessThanOrEqual(Literal(t: Double, DoubleType), c: CosineSimExact)
        if t > Margin => prefixed(le, c, t)
    case lt @ LessThan(Literal(t: Double, DoubleType), c: CosineSimExact)
        if t > Margin => prefixed(lt, c, t)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !cond.exists(_.isInstanceOf[DotFast]) =>
      val newCond = rewrite(cond)
      if (newCond eq cond) f else Filter(newCond, child)
    // predicate pushdown folds these filters into join conditions (the
    // common resting place for pair-similarity thresholds: an equi-join on
    // the blocking key with the cosine threshold as the extra condition),
    // so the rewrite must reach Join conditions too
    case j @ Join(_, _, _, Some(cond), _) if !cond.exists(_.isInstanceOf[DotFast]) =>
      val newCond = rewrite(cond)
      if (newCond eq cond) j else j.copy(condition = Some(newCond))
  }
}
