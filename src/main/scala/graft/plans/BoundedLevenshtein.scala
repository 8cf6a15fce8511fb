package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThanOrEqual, Length, LessThanOrEqual, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: every `levenshtein(a, b) <= k` predicate (k an int
  * literal) is rewritten to
  *
  *   abs(length(a) − length(b)) <= k  AND  levenshtein(a, b, k) >= 0
  *
  * Two wins, both pure rewrites of a semantically identical predicate:
  * the O(1) length guard discards wildly-different strings before any DP
  * runs (edit distance is bounded below by the length difference), and
  * the surviving pairs run Spark's THRESHOLD form of the DP — banded
  * O(k·min(len)) instead of the full O(len²) table, returning −1 as soon
  * as the band exceeds k (so `>= 0` ⇔ `distance <= k`). On similarity
  * joins the unbounded form is the hot expression; user code shouldn't
  * have to know the 3-arg variant exists.
  *
  * NULL inputs: the original predicate yields NULL (row filtered); the
  * rewritten conjunction yields NULL through both conjuncts — identical.
  * Idempotent by construction: the rewrite leaves no thresholdless
  * `levenshtein <= literal` pattern behind, so the fixpoint batch
  * terminates. Injected cluster-wide by [[GraftExtensions]] and into live
  * sessions by [[GraftFunctions.register]].
  */
object BoundedLevenshtein extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Expression): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k),
      GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        bounded(a, b, k)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        bounded(a, b, k)
    }
}
