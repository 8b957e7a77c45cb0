package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` extension surface, SURVEY.md
  * §7.3): guard `levenshtein(a, b) <= k` predicates with the free
  * length-difference bound `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is at least the length difference, so the guard is
  * semantics-preserving — and because `length` is cheap and codegen'd, a
  * fuzzy theta join (j9 shape) short-circuits the O(|a|·|b|) DP kernel for
  * every candidate pair the bound rejects. On an n-gram-blocked fuzzy join
  * at scale the same guard prunes before the distance kernel runs.
  *
  * Installed cluster-wide via `spark.sql.extensions=graft.functions.
  * GraftExtensions` (injectOptimizerRule) or on a live session with
  * [[LevenshteinPrune.install]]. The rewrite tags itself (a no-op `true`
  * conjunct is NOT used; instead it checks for an existing guard) so the
  * fixed-point optimizer cannot re-apply it forever.
  */
object LevenshteinPrune extends Rule[LogicalPlan] {

  private def guardFor(l: Expression, r: Expression,
                       k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  /** Is `cond` (or a conjunct of it) already the guard for (l, r, k)? */
  private def hasGuard(cond: Expression, l: Expression, r: Expression,
                       k: Expression): Boolean = {
    val g = guardFor(l, r, k)
    cond.exists(_.semanticEquals(g))
  }

  private def rewrite(cond: Expression): Expression = cond transformUp {
    case le @ LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, _))
        if !hasGuard(cond, l, r, k) =>
      And(guardFor(l, r, k), le)
    // dist < k implies abs(len(a)-len(b)) <= lev(a,b) < k, so the same <=
    // guard form is valid here — and using guardFor keeps hasGuard able to
    // detect it, so the fixed-point optimizer converges after one pass.
    case lt @ LessThan(Levenshtein(l, r, None), k @ Literal(_, _))
        if !hasGuard(cond, l, r, k) =>
      And(guardFor(l, r, k), lt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else f.copy(condition = next)
    case j @ Join(_, _, _, Some(cond), _) =>
      val next = rewrite(cond)
      if (next fastEquals cond) j else j.copy(condition = Some(next))
  }

  /** Live-session installation (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
