package graft

import org.apache.spark.sql.execution.{FilterExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, BroadcastQueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Shared physical-plan predicates for the plan-quality gates. */
object PlanGuards {

  /** Flatten the physical tree, descending through the AQE wrapper
    * (AdaptiveSparkPlanExec holds its plan as a field, not a child, so
    * a plain collect() would see none of the join nodes). */
  def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.inputPlan)
    case other => other +: other.children.flatMap(flatten)
  }

  /** True iff the subtree provably emits ≤ 1 row: a global aggregate
    * (no grouping keys) reached through exchange/projection/codegen
    * wrappers only. Anything else — a scan, a join, a generate — fails
    * the walk, so a big×big nested-loop build side can never pass. */
  def scalarSubtree(sp: SparkPlan): Boolean = sp match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case e: BroadcastExchangeExec => scalarSubtree(e.child)
    case r: ReusedExchangeExec => scalarSubtree(r.child)
    case q: BroadcastQueryStageExec => scalarSubtree(q.plan)
    case w: WholeStageCodegenExec => scalarSubtree(w.child)
    case i: InputAdapter => scalarSubtree(i.child)
    case pr: ProjectExec => scalarSubtree(pr.child)
    case f: FilterExec => scalarSubtree(f.child)
    case _ => false
  }

  /** The build side of a BroadcastNestedLoopJoinExec. */
  def buildSide(b: BroadcastNestedLoopJoinExec): SparkPlan =
    b.buildSide match {
      case BuildLeft => b.left
      case BuildRight => b.right
    }
}
