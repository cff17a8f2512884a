package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance predicates.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic program
  * for every candidate pair before comparing — at 100 TB of fuzzy-dedup
  * candidates that dominates the join. This rule rewrites the predicate to
  *
  *   abs(length(a) - length(b)) <= k AND levenshtein(a, b, k) >= 0
  *
  * which is equivalent because (i) edit distance is bounded below by the
  * length difference, so the guard never rejects a true match, and (ii)
  * Spark's threshold form returns the distance when it is <= k and -1
  * otherwise (banded DP, O(k·min(|a|,|b|)) per pair with early exit).
  * The cheap O(1) length guard runs first (And short-circuits in codegen),
  * so most non-matching pairs never touch the DP at all.
  *
  * Null semantics are preserved: both forms yield NULL on NULL input, and
  * `NULL AND x` can only weaken to FALSE inside a filter predicate, where
  * NULL and FALSE already coincide.
  *
  * Registered through `GraftExtensions` (injectOptimizerRule for
  * config-built sessions, `experimental.extraOptimizations` for live
  * ones); both run after the main optimizer batches, so the rewrite never
  * interferes with filter pushdown of the surrounding conjuncts.
  * Idempotent: the rewritten Levenshtein carries a threshold, which the
  * match explicitly excludes.
  */
object BoundedLevenshtein extends Rule[LogicalPlan] {

  private object NonNegIntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) if v >= 0 => Some(v)
      case _ => None
    }
  }

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    And(
      LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k)),
      GreaterThanOrEqual(
        Levenshtein(a, b, Some(Literal(k))), Literal(0)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Levenshtein(a, b, None), NonNegIntLit(k)) =>
        bounded(a, b, k)
      case GreaterThanOrEqual(NonNegIntLit(k), Levenshtein(a, b, None)) =>
        bounded(a, b, k)
      // lev(a,b) < k  /  k > lev(a,b)   (k >= 1, else statically false)
      case LessThan(Levenshtein(a, b, None), NonNegIntLit(k)) if k >= 1 =>
        bounded(a, b, k - 1)
      case GreaterThan(NonNegIntLit(k), Levenshtein(a, b, None)) if k >= 1 =>
        bounded(a, b, k - 1)
    }
}
