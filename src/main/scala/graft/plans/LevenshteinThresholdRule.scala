package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite thresholded edit-distance filters into their
  * banded form.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) DP matrix and only
  * then compares. Spark's 3-arg `levenshtein(a, b, k)` runs the banded
  * O(k·min(|a|,|b|)) DP with early exit, returning −1 once the distance
  * provably exceeds k — for near-dup verification (small k, long strings)
  * that is a ~|a|/k speedup. This rule rewrites
  *
  * {{{ levenshtein(a, b) <= k   ⟶   abs(length(a) − length(b)) <= k
  *                                   AND levenshtein(a, b, k) >= 0 }}}
  *
  * (`lev(a,b,k) >= 0` ⟺ distance ≤ k, since the banded form returns −1
  * beyond the threshold; the length guard is implied by
  * `lev ≥ |len(a)−len(b)|` and short-circuits the DP entirely for
  * length-mismatched pairs). `levenshtein(a, b) < k` rewrites with k−1.
  * Only literal non-negative thresholds are touched; the 3-arg form no
  * longer matches the pattern, so the rule is idempotent inside Catalyst's
  * fixed-point operator-optimization batch.
  *
  * Registered by [[graft.GraftExtensions]] via `injectOptimizerRule` — the
  * (c)-tier custom-Catalyst path (logical Rule) of SURVEY.md §7's extension
  * preference order. */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The banded rewrite for one `lev(a,b) <= k` conjunct. */
  private def banded(a: Expression, b: Expression, k: Int): Expression = {
    val kLit = Literal(k)
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), kLit),
      GreaterThanOrEqual(Levenshtein(a, b, Some(kLit)), Literal(0)))
  }

  private def rewriteConjunct(e: Expression): Expression = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      banded(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      banded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      banded(a, b, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
      banded(a, b, k - 1)
    case other => other
  }

  /** Rewrite every eligible conjunct of a predicate; None when untouched. */
  private def rewriteCond(cond: Expression): Option[Expression] = {
    val parts = conjuncts(cond)
    val rewritten = parts.map(rewriteConjunct)
    if (parts.zip(rewritten).forall { case (x, y) => x eq y }) None
    else Some(rewritten.reduce(And))
  }

  // Filter predicates AND join conditions: PushPredicateThroughJoin folds a
  // cross-side levenshtein filter into the Join's condition before this rule
  // runs, so matching Filter alone would miss the common pair-join shape.
  // The rewrite is an exact 3-valued-logic equivalence (guard null/false only
  // when the original is null/false), so it is safe in either position.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      rewriteCond(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      rewriteCond(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
