package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: every bounded-edit-distance predicate
  * `levenshtein(a, b) <= k` gains the LOSSLESS companion conjunct
  * `abs(length(a) - length(b)) <= k` — sound because edit distance is
  * bounded below by the length difference (each edit changes the length
  * by at most one), so the added test can never reject a surviving row.
  *
  * Why a RULE and not a coding convention: the length test is O(1) per
  * row against Levenshtein's O(|a|·|b|), and as a standalone conjunct it
  * is visible to the REST of the optimizer — Catalyst can evaluate it
  * first in the conjunction (short-circuiting the quadratic call), and
  * when the predicate sits on a join, a fuzzy self-join's worst pairs are
  * rejected by two integer column reads instead of a dynamic-programming
  * table. On a 100 TB fuzzy-dedup verify stage the quadratic scalar is
  * the hot loop; this is the classic bound-prefilter rewrite applied
  * mechanically wherever the pattern appears (user SQL included, via the
  * `graft.GraftExtensions` injection).
  *
  * Idempotent by construction: a predicate is only rewritten if its
  * companion conjunct is not already present (structural check), so
  * fixed-point iteration of the rule batch cannot stack duplicates. */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** The companion bound for `lev(a,b) <= k`. */
  private def bound(l: Expression, r: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k)

  /** Rewrite every qualifying conjunct in a predicate tree. The rule
    * DUPLICATES the levenshtein arguments into the companion conjunct, so
    * it must only fire when both are deterministic — a non-deterministic
    * argument (rand(), uuid()…) would be re-evaluated independently in
    * the bound and could reject rows the original predicate accepts
    * (the standard Catalyst guard for expression-duplicating rewrites). */
  private def addBounds(cond: Expression): Expression = {
    val conjuncts = splitConjuncts(cond)
    val additions = conjuncts.collect {
      case LessThanOrEqual(Levenshtein(l, r, None), k @ Literal(_, IntegerType))
          if l.deterministic && r.deterministic &&
            !conjuncts.exists(_.semanticEquals(bound(l, r, k))) =>
        bound(l, r, k)
      case LessThan(Levenshtein(l, r, None), k @ Literal(_, IntegerType))
          if l.deterministic && r.deterministic &&
            !conjuncts.exists(_.semanticEquals(bound(l, r, k))) =>
        bound(l, r, k)
    }
    if (additions.isEmpty) cond
    else (additions ++ conjuncts).reduce(And)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = addBounds(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val rewritten = addBounds(cond)
      if (rewritten fastEquals cond) j else j.copy(condition = Some(rewritten))
  }
}
