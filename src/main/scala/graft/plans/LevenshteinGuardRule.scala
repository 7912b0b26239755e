package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: make thresholded edit-distance predicates cheap.
  *
  * `levenshtein(a, b) <= k` (the shape every edit-distance dedup writes,
  * q167) costs O(|a|·|b|) per candidate pair with full DP. Two public
  * facts make it far cheaper without changing a single result row:
  *
  *  1. `||a| − |b|| > k  ⟹  levenshtein(a, b) > k` — a length gap needs
  *     at least that many edits. The injected guard conjunct costs O(1)
  *     (lengths are already materialized) and short-circuits the DP for
  *     every length-mismatched pair.
  *  2. Spark's own `Levenshtein(a, b, threshold = k)` runs the BANDED
  *     O(k·min(|a|,|b|)) DP and returns −1 above the threshold, so the
  *     predicate rewrites to `levenshtein(a, b, k) >= 0` — same boolean,
  *     k/|b| of the work on pairs that do reach the DP.
  *
  * Scope: conjuncts of Filter and Join conditions of the exact shapes
  * `lev <= k` / `k >= lev` (k an integer literal, lev threshold-free).
  * `lev < k` gets the length guard only (k ≥ 1; guard with k is implied
  * by the tighter k−1 bound). Fixed-point safe by construction: the
  * rewritten predicate carries a thresholded Levenshtein, which the
  * matcher refuses, and re-running on a guarded condition finds the
  * guard already present (semantic check) and leaves it untouched.
  * `spark.graft.levguard.enabled=false` disables the rewrite.
  */
object LevenshteinGuardRule extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.levguard.enabled"
  private def enabled: Boolean = {
    val v = SQLConf.get.getConfString(EnabledKey, "true")
    try v.toBoolean catch {
      case _: IllegalArgumentException => throw new IllegalArgumentException(
        s"$EnabledKey must be true/false, got '$v'")
    }
  }

  private def guard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  /** The (a, b, k, banded?) of a rewritable conjunct, if any. */
  private def matchLev(p: Expression): Option[(Expression, Expression, Expression, Boolean)] =
    p match {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        Some((a, b, k, true))
      case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        Some((a, b, k, true))
      case LessThan(Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
        Some((a, b, k, false)) // guard only; banded form would need k−1
      case GreaterThan(k @ Literal(_, IntegerType), Levenshtein(a, b, None)) =>
        Some((a, b, k, false))
      case _ => None
    }

  private def rewriteCond(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    var changed = false
    val out = conjuncts.flatMap { p =>
      matchLev(p) match {
        case Some((a, b, k, banded)) =>
          val g = guard(a, b, k)
          if (conjuncts.exists(_.semanticEquals(g))) Seq(p) // already guarded
          else {
            changed = true
            val pred =
              if (banded) GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))
              else p
            Seq(g, pred)
          }
        case None => Seq(p)
      }
    }
    if (changed) Some(out.reduce(And)) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        rewriteCond(cond).map(Filter(_, child)).getOrElse(f)
      case j @ Join(_, _, _, Some(cond), _) =>
        rewriteCond(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
    }
  }
}
