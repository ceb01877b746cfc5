package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, Length, LessThan, LessThanOrEqual, Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: prefix every `levenshtein(a, b) <= k` (or `< k`)
  * filter with the O(1) guard `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is bounded below by the length difference, so the
  * guard never changes the result (null propagation matches too: a null
  * input nulls both predicates) — but it short-circuits the O(|a|·|b|)
  * dynamic program for every candidate pair whose lengths already rule
  * it out. In a blocked fuzzy join (`FuzzyJoin`) the filter runs on
  * every candidate pair, so at 100 TB this is the difference between a
  * length compare and a full DP table for the (majority of) pairs a
  * coarse block admits. The rewrite runs in the fixed-point
  * "User Provided Optimizers" batch, so it is IDEMPOTENT: a guard is
  * added only if no semantically-equal conjunct is already present.
  *
  * The three Catalyst extension surfaces this engine uses, together:
  * custom `Expression` (`CosineSimilarity`), custom
  * `LogicalPlan`/`SparkStrategy`/`SparkPlan` (`TopKPerGroup`), and this
  * `Rule[LogicalPlan]`.
  */
object LevenshteinLengthGuard extends Rule[LogicalPlan] with PredicateHelper {

  /** The cheap guard implied by one levenshtein bound, if `e` is one. */
  private def guardFor(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(l: Levenshtein, k @ Literal(_, IntegerType)) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(l.left), Length(l.right))), k))
    case LessThan(l: Levenshtein, k @ Literal(_, IntegerType)) =>
      Some(LessThan(Abs(Subtract(Length(l.left), Length(l.right))), k))
    case _ => None
  }

  /** `cond` with every implied-and-missing guard conjoined in front;
    * None when nothing to add. Because each guard is IMPLIED by its
    * levenshtein conjunct (and nulls co-occur — both sides null exactly
    * when an input string is null), `cond ∧ guards ≡ cond` row-for-row,
    * which makes the rewrite safe in a Filter and in ANY join type's
    * condition alike. */
  private def guarded(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(guardFor)
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      .distinct
    if (guards.isEmpty) None
    else Some((guards ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      guarded(cond).map(c => f.copy(condition = c)).getOrElse(f)
    // PushDownPredicates folds post-join filters into the join condition
    // itself, so the levenshtein bound usually lives HERE by the time
    // user rules run.
    case j @ Join(_, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
