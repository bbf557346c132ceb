package graft.plans

import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, Round}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.CosineSim
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}

/** Domain-specific algebraic optimizations (SURVEY.md §2.E e03),
  * injected by [[GraftExtensions]]. Catalyst's ConstantFolding handles
  * foldable inputs; these add algebra Catalyst can't know.
  */

/** cosine_sim(x, x) ≡ 1.0 for any deterministic x — skips three array
  * passes per row. Null-preserving: a nullable child folds to
  * IF(x IS NULL, NULL, 1.0) (CosineSim is null-intolerant), a
  * non-nullable one to the bare literal. Degenerate vectors: the engine
  * DEFINES self-similarity as 1 (a vector is identical to itself) even
  * where the pairwise kernel yields NaN — zero-norm vectors and vectors
  * containing NaN elements both fold to 1.0 under this rule. The fold
  * fires only on syntactically canonical-equal arguments, so value-equal
  * but syntactically different expressions keep kernel semantics; that
  * asymmetry is the price of a compile-time rule and is spec-pinned in
  * GraftRulesSpec.
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
  *
  * Restricted to floating-point children: for DecimalType, Round's
  * result type depends on the scale argument, so collapsing the outer
  * round would change the optimized plan's schema (decimal scale /
  * precision) after analysis — a post-analysis rule must be
  * type-preserving.
  */
object RedundantRoundRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Round(inner @ Round(e, Literal(s1: Int, IntegerType), ansiInner),
          Literal(s2: Int, IntegerType), ansiOuter)
          if s1 <= s2 &&
            (inner.dataType == DoubleType || inner.dataType == FloatType) =>
        Round(e, Literal(s1, IntegerType), ansiInner || ansiOuter)
    }
}
