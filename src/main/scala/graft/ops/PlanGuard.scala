package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-hazard linter for physical plans — the checks this repo's specs
  * hand-roll per query (PlanAuditSpec), packaged so USERS can gate their
  * own pipelines before a 100 TB run. A plan that is correct at test SF
  * can still be a scale bug; these are the shapes that stop working at
  * 1000 executors:
  *
  *  - `cartesian-product` (ERROR): CartesianProductExec — |L|×|R| row
  *    blowup with no equi-key. Never survives a scale-up.
  *  - `global-window` (ERROR): a window function with an EMPTY
  *    PARTITION BY — Spark plans it as one task holding the whole
  *    input (the q113 lesson: use a two-pass global index instead).
  *  - `nested-loop-join` (WARN): BroadcastNestedLoopJoinExec — fine
  *    when the broadcast side is a literal/1-row frame (the q06 scalar
  *    cross-join pattern), quadratic otherwise; the detail names the
  *    build side so the caller can judge.
  *  - `single-partition-exchange` (WARN): an Exchange to
  *    SinglePartition — a 1-reducer funnel mid-plan (global sorts into
  *    limits are fine; a SinglePartition shuffle feeding more compute
  *    is usually a missing partition key).
  *
  * `audit` walks the adaptive node's CURRENT physical plan and descends
  * into subqueries. On a frame that has already run, that is the final
  * post-AQE tree (runtime-demoted broadcasts, coalesced exchanges); on
  * an unexecuted frame — the usual pre-run gate — it is the INITIAL
  * physical plan, so hazards AQE introduces at replan time (e.g. a
  * demoted broadcast) are not visible until execution. The rules above
  * are mostly structural (a global window or cartesian join is declared
  * in the query, not invented by AQE), but join-strategy rules can shift
  * at replan time — re-audit after a run when you need the as-executed
  * verdict. `assertScaleSafe` turns ERROR findings into an
  * exception for CI gates; WARNs pass (they need human judgment), but
  * arrive in the returned findings.
  */
object PlanGuard {

  final case class Finding(severity: String, rule: String, detail: String) {
    override def toString: String = s"[$severity] $rule: $detail"
  }

  /** All findings for the frame's physical plan (post-AQE when enabled). */
  def audit(df: DataFrame): Seq[Finding] =
    auditPlan(df.queryExecution.executedPlan)

  def auditPlan(root: SparkPlan): Seq[Finding] = {
    val nodes = flatten(root)
    nodes.flatMap {
      case c: CartesianProductExec =>
        Some(Finding("error", "cartesian-product",
          s"|L|x|R| row blowup: ${oneLine(c)}"))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some(Finding("error", "global-window",
          s"empty PARTITION BY plans as one task holding the whole " +
            s"input: ${oneLine(w)}"))
      case j: BroadcastNestedLoopJoinExec =>
        Some(Finding("warn", "nested-loop-join",
          s"${j.joinType} build=${j.buildSide} — fine for 1-row/literal " +
            s"broadcast frames, quadratic otherwise: ${oneLine(j)}"))
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        Some(Finding("warn", "single-partition-exchange",
          s"1-reducer funnel: ${oneLine(e)}"))
      case _ => None
    }
  }

  /** Throws IllegalStateException when the plan carries any ERROR-grade
    * finding whose rule is not in `allow`. Returns all findings (incl.
    * WARNs) so callers can log them. */
  def assertScaleSafe(df: DataFrame,
                      allow: Set[String] = Set.empty): Seq[Finding] = {
    val fs = audit(df)
    val bad = fs.filter(f => f.severity == "error" && !allow(f.rule))
    if (bad.nonEmpty) throw new IllegalStateException(
      s"plan is not scale-safe:\n${bad.mkString("\n")}")
    fs
  }

  /** Pre-order walk that crosses the AQE boundary (the adaptive node's
    * current physical plan) and descends into subquery plans. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children
    }
    val subs = p.subqueries
    p +: (kids ++ subs).flatMap(flatten)
  }

  private def oneLine(p: SparkPlan): String =
    p.simpleStringWithNodeId().linesIterator.next().take(160)
}
