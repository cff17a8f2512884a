package graft.plans

import graft.text.{JaroWinkler, Utf16Length}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Optimizer rule: length-prefilter high-threshold Jaro-Winkler
  * predicates (the BoundedLevenshtein discipline applied to the q137
  * comparator).
  *
  * `jaro_winkler(a, b) >= t` walks both strings' match windows for every
  * candidate pair — at 100 TB of blocking-survivor pairs that O(|a|·|b|)
  * window scan dominates the join. For t > 0.8 a cheap NECESSARY length
  * condition exists:
  *
  *   - the Winkler boost is at most 4·0.1·(1−jaro), so
  *     jw ≤ 0.6·jaro + 0.4 always, hence jw ≥ t ⟹ jaro ≥ (t−0.4)/0.6;
  *   - with mn = min(|a|,|b|), mx = max(|a|,|b|): m ≤ mn gives
  *     jaro ≤ (m/|a| + m/|b| + 1)/3 ≤ (2 + mn/mx)/3,
  *     hence jaro ≥ (t−0.4)/0.6 ⟹ mn ≥ (5t−4)·mx.
  *
  * The rewrite is
  *
  *   mn >= (5t−4−ε)·mx AND NOT(jaro_winkler(a, b) < t)
  *
  * — the O(1) guard runs first (And short-circuits in codegen) and can
  * never reject a true match (ε = 1e-9 absorbs the double rounding of
  * 5t−4, keeping the guard strictly conservative). `NOT(x < t)` is the
  * null-preserving equivalent of `x >= t` that the rule's own pattern
  * does not match, making the rewrite idempotent under the fixed-point
  * extra-optimizer batch (the same reason BoundedLevenshtein's rewritten
  * form carries a threshold). For t ≤ 0.8 the bound is vacuous (≤ 0) and
  * the predicate is left alone.
  *
  * Null semantics are preserved: both forms yield NULL on NULL input,
  * and `NULL AND x` inside a filter coincides with FALSE exactly as the
  * original NULL did.
  */
object JaroPrefilter extends Rule[LogicalPlan] {

  /** Threshold literal above which the length bound is non-vacuous;
    * accepts DOUBLE and the DECIMAL a bare SQL literal parses as. */
  private object HighThreshold {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) if v > 0.8 => Some(v)
      case Literal(d: org.apache.spark.sql.types.Decimal, _: DecimalType)
        if d.toDouble > 0.8 => Some(d.toDouble)
      case _ => None
    }
  }

  // Lengths are measured in UTF-16 CODE UNITS (Utf16Length) — the same
  // units JaroWinklerKernel.jw scores with — NOT Spark's Length (code
  // points). The two diverge up to 2× on supplementary-plane text, and a
  // guard in the wrong units would silently reject true matches
  // (round-14 advice item).
  private def guarded(a: Expression, b: Expression, t: Double): Expression = {
    val ratio = Literal(5.0 * t - 4.0 - 1e-9)
    val mn = Cast(Least(Seq(Utf16Length(a), Utf16Length(b))), DoubleType)
    val mx = Cast(Greatest(Seq(Utf16Length(a), Utf16Length(b))), DoubleType)
    And(
      GreaterThanOrEqual(mn, Multiply(ratio, mx)),
      Not(LessThan(JaroWinkler(a, b), Literal(t))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // jw(a,b) >= t  /  t <= jw(a,b)
      case GreaterThanOrEqual(JaroWinkler(a, b), HighThreshold(t)) =>
        guarded(a, b, t)
      case LessThanOrEqual(HighThreshold(t), JaroWinkler(a, b)) =>
        guarded(a, b, t)
      // jw(a,b) > t / t < jw(a,b): the same guard is necessary for the
      // strictly-greater set (a subset); keep the strict comparison.
      case GreaterThan(JaroWinkler(a, b), HighThreshold(t)) =>
        And(guarded(a, b, t).asInstanceOf[And].left,
          Not(LessThanOrEqual(JaroWinkler(a, b), Literal(t))))
      case LessThan(HighThreshold(t), JaroWinkler(a, b)) =>
        And(guarded(a, b, t).asInstanceOf[And].left,
          Not(LessThanOrEqual(JaroWinkler(a, b), Literal(t))))
    }
}
