package graft.plan

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: infer the per-side conjunctive HULL of a cross-table
  * OR-of-ANDs filter and plant it on the join children, where the scans
  * can prune on it.
  *
  * The TPC-H Q19 shape —
  * {{{
  *   WHERE (p_brand = 'B1' AND l_quantity BETWEEN 1 AND 11)
  *      OR (p_brand = 'B2' AND l_quantity BETWEEN 10 AND 20)
  * }}}
  * — can only evaluate after the join, and Catalyst's constraint
  * propagation does not derive the single-side implications
  * `(l_quantity BETWEEN 1 AND 11 OR l_quantity BETWEEN 10 AND 20)` /
  * `(p_brand = 'B1' OR p_brand = 'B2')`, so both scans read everything.
  * Production engines extract exactly these hulls (Trino's
  * tuple-domain extraction, Calcite's RexUtil simplification); q202 and
  * q199 originally wrote them by hand. This rule derives them:
  *
  *  - For a `Filter` directly above an INNER/CROSS `Join`, each
  *    top-level conjunct that is a disjunction is split; if EVERY
  *    disjunct carries ≥1 deterministic conjunct referencing only one
  *    join side, `OR(AND(those conjuncts))` is implied for that side
  *    and is inserted as a `Filter` on the child, where physical
  *    planning's `PhysicalOperation` collection turns it into parquet
  *    `PushedFilters`.
  *  - Soundness: for any row passing the original predicate, some
  *    disjunct is true, hence its side-local conjuncts are true, hence
  *    the hull is true — `f ≡ f ∧ hull`, and the original filter is
  *    left in place. Restricted to Inner/Cross joins: under an OUTER
  *    join a disjunct like `r.x IS NULL` is true on the null-extended
  *    row but its hull pushed into R changes which rows null-extend.
  *  - Convergence (the rule runs in a fixed-point batch): a hull is
  *    only planted if no semantically-equal conjunct already filters
  *    that subtree, so the second pass is a no-op.
  *
  * Registered by [[graft.GraftExtensions]] both as a session extension
  * (`spark.sql.extensions` deployment) and through
  * `spark.experimental.extraOptimizations` for already-built sessions
  * (the "User Provided Optimizers" batch runs after the main operator
  * batch, which is why the rule plants the hull directly on the join
  * child instead of relying on another pushdown pass).
  */
object InferDisjunctionHulls extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other     => Seq(other)
  }

  private def disjuncts(e: Expression): Seq[Expression] = e match {
    case Or(a, b) => disjuncts(a) ++ disjuncts(b)
    case other    => Seq(other)
  }

  /** `OR(AND(side-only conjuncts per disjunct))`, if every disjunct has
    * at least one — otherwise the disjunction implies nothing about
    * this side. */
  private def hullFor(or: Expression, side: AttributeSet): Option[Expression] = {
    val perDisjunct = disjuncts(or).map { d =>
      conjuncts(d).filter(c =>
        c.deterministic && c.references.nonEmpty &&
          c.references.subsetOf(side))
    }
    if (perDisjunct.size < 2 || perDisjunct.exists(_.isEmpty)) None
    else Some(perDisjunct.map(_.reduce(And)).reduce(Or))
  }

  /** A semantically-equal predicate already filters the subtree (either
    * planted by a previous pass of this rule or written by the user). */
  private def alreadyFiltered(hull: Expression, plan: LogicalPlan): Boolean =
    plan.collect { case f: Filter => conjuncts(f.condition) }
      .flatten.exists(_.semanticEquals(hull))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: Join)
        if j.joinType == Inner || j.joinType == Cross =>
      val ors = conjuncts(cond).filter(c => c.isInstanceOf[Or] && c.deterministic)
      var left = j.left
      var right = j.right
      for (or <- ors) {
        hullFor(or, j.left.outputSet).foreach { h =>
          if (!alreadyFiltered(h, left)) left = Filter(h, left)
        }
        hullFor(or, j.right.outputSet).foreach { h =>
          if (!alreadyFiltered(h, right)) right = Filter(h, right)
        }
      }
      if ((left eq j.left) && (right eq j.right)) f
      else f.copy(child = j.copy(left = left, right = right))
  }
}
