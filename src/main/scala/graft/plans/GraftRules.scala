package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.CosineSim
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Domain-specific algebraic optimizations (SURVEY.md §2.E e03),
  * injected by [[GraftExtensions]]. Catalyst's ConstantFolding handles
  * foldable inputs; these add algebra Catalyst can't know.
  */

/** cosine_sim(x, x) ≡ 1.0 for any deterministic x — skips three array
  * passes per row. Null-preserving: a nullable child folds to
  * IF(x IS NULL, NULL, 1.0) (CosineSim is null-intolerant), a
  * non-nullable one to the bare literal. Zero-norm vectors: the engine
  * defines self-similarity as 1 (a vector is identical to itself),
  * whereas the pairwise kernel yields NaN for zero norms; the rule
  * implements the self-sim definition.
  */
object CosineSelfSimRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSim(a, b)
          if a.deterministic && a.canonicalized == b.canonicalized =>
        if (a.nullable)
          If(IsNull(a), Literal(null, DoubleType), Literal(1.0, DoubleType))
        else Literal(1.0, DoubleType)
    }
}

/** round(round(e, s1), s2) ≡ round(e, s1) when s1 ≤ s2 — a value
  * already at s1 decimals is a fixed point of any coarser-or-equal
  * rounding. Arises when engine-boundary rounding (cosineSim4 etc.)
  * composes with user-side rounding.
  */
object RedundantRoundRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Round(Round(e, Literal(s1: Int, IntegerType), ansiInner),
          Literal(s2: Int, IntegerType), ansiOuter) if s1 <= s2 =>
        Round(e, Literal(s1, IntegerType), ansiInner || ansiOuter)
    }
}
